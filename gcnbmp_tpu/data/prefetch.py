"""Background-thread batch prefetching.

The reference's SerialIterator prepares batches synchronously on the
host between device steps (train_ddi_modify_eval2.py:556-558).  Here a
small thread pool packs/pads the next batches and stages them to the
device while the current step runs, so host featurization/packing
overlaps device compute — the standard input-pipeline design the
Chainer stack lacked.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap a batch iterator; stage ``depth`` batches ahead on a worker
    thread, optionally transferring each to the device via ``transfer``.

    Exceptions on the worker are re-raised at the consumer.
    """

    _SENTINEL = object()

    def __init__(
        self,
        iterator: Iterator,
        depth: int = 2,
        transfer: Optional[Callable] = None,
    ):
        self._it = iterator
        self._transfer = transfer or (lambda b: b)
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._done = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._it:
                self._q.put(self._transfer(batch))
        except BaseException as e:  # noqa: BLE001 - re-raised at consumer
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        if self._done:
            raise StopIteration
        item = self._q.get()
        if item is self._SENTINEL:
            self._done = True
            if self._err is not None:
                err, self._err = self._err, None
                raise err
            raise StopIteration
        return item


def device_put_batch(batch, device=None):
    """Transfer every array field of a (dataclass-style) batch to the
    device; non-blocking (jax.device_put is async)."""
    import dataclasses

    import numpy as np

    def put(x):
        if isinstance(x, np.ndarray):
            return jax.device_put(x, device)
        return x

    if dataclasses.is_dataclass(batch):
        return dataclasses.replace(
            batch,
            **{
                f.name: put(getattr(batch, f.name))
                for f in dataclasses.fields(batch)
            },
        )
    return jax.tree.map(put, batch)
