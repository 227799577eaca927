"""Multi-host initialization and per-host data feeding.

The reference has no multi-host story (SURVEY §5.8: a 2-GPU
ParallelUpdater is its entire distribution stack).  Here: standard
jax.distributed bring-up for TPU pod slices, global-mesh construction
spanning all hosts, and a helper to build globally-sharded arrays from
per-host shards (collectives then ride ICI within a slice and DCN
across slices, chosen by XLA from the mesh layout).

Untestable on this 1-chip environment; the logic below is the standard
jax multi-host recipe and the mesh/step code it feeds is exercised on
the virtual 8-device mesh in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with TPU auto-detection (on Cloud TPU
    all arguments are discovered from the environment)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def global_mesh(
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Mesh over ALL devices across hosts; the model axis is laid out
    within a host (fast ICI), data across hosts."""
    devices = jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices % model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, tuple(axis_names))


def host_local_to_global(
    local_batch: np.ndarray, mesh: Mesh, axis: str = "data"
):
    """Assemble a globally-sharded array from this host's shard
    (jax.make_array_from_process_local_data)."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local_batch)
