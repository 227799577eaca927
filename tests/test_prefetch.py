"""Prefetching iterator tests."""

import time

import numpy as np
import pytest

from gcnbmp_tpu.data.prefetch import PrefetchIterator, device_put_batch


def test_prefetch_preserves_order_and_content():
    items = list(range(20))
    out = list(PrefetchIterator(iter(items), depth=3))
    assert out == items


def test_prefetch_overlaps_production():
    def slow_producer():
        for i in range(6):
            time.sleep(0.05)
            yield i

    it = PrefetchIterator(slow_producer(), depth=2)
    time.sleep(0.2)  # let the worker run ahead
    t0 = time.perf_counter()
    first_three = [next(it), next(it), next(it)]
    dt = time.perf_counter() - t0
    assert first_three == [0, 1, 2]
    assert dt < 0.1  # already staged


def test_prefetch_propagates_exceptions():
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)
    with pytest.raises(StopIteration):
        next(it)


def test_device_put_batch_dataclass():
    from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
    from gcnbmp_tpu.data.dataset import PairDataset, make_batch

    f = GGNNFeaturizer()
    ds = PairDataset()
    ds.append(f(mol_from_smiles("CCO")), f(mol_from_smiles("CC")), np.float32(1))
    batch = make_batch(ds, [0])
    placed = device_put_batch(batch)
    import jax

    assert isinstance(placed.atoms1, jax.Array)
    np.testing.assert_array_equal(np.asarray(placed.atoms1), batch.atoms1)
