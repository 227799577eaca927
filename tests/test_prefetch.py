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
    assert dt < 0.15  # already staged (loose: CI scheduler noise)


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


def test_prefetch_worker_pool_preserves_order():
    def jittery_transfer(x):
        time.sleep(0.01 * ((x * 7) % 3))  # out-of-order completion
        return x * 10

    items = list(range(24))
    out = list(PrefetchIterator(iter(items), depth=4,
                                transfer=jittery_transfer, workers=4))
    assert out == [x * 10 for x in items]


def test_prefetch_worker_pool_overlaps_transfers():
    def slow_transfer(x):
        time.sleep(0.05)
        return x

    items = list(range(8))
    t0 = time.perf_counter()
    out = list(PrefetchIterator(iter(items), depth=8,
                                transfer=slow_transfer, workers=4))
    dt = time.perf_counter() - t0
    assert out == items
    assert dt < 8 * 0.05  # serial would take >=0.4s


def test_prefetch_worker_pool_propagates_transfer_exceptions():
    def bad_transfer(x):
        if x == 2:
            raise ValueError("transfer boom")
        return x

    it = PrefetchIterator(iter(range(5)), depth=4,
                          transfer=bad_transfer, workers=3)
    with pytest.raises(ValueError, match="transfer boom"):
        list(it)


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
