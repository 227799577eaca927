"""Native packed-batch builder agreement with the Python spec, and the
COO input path (device-side adjacency materialization)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset
from gcnbmp_tpu.data.packing import (
    pack_pair_dataset_batch,
    pack_pair_dataset_coo,
)

SMILES = [
    "CC(=O)Oc1ccccc1C(=O)O",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
    "CCO",
    "c1ccccc1",
    "NC(=O)c1ccc[nH]1",
    "OC(=O)c1ccccc1O",
    "CN1CCC[C@H]1c1cccnc1",
]


@pytest.fixture(scope="module")
def ds():
    f = GGNNFeaturizer()
    graphs = [f(mol_from_smiles(s)) for s in SMILES]
    rng = np.random.default_rng(7)
    d = PairDataset()
    for _ in range(64):
        d.append(
            graphs[int(rng.integers(len(graphs)))],
            graphs[int(rng.integers(len(graphs)))],
            np.float32(rng.integers(0, 2)),
        )
    return d


def test_coo_to_dense_matches_dense_pack(ds):
    idx = list(range(32))
    dense = pack_pair_dataset_batch(ds, idx, num_tiles=8)
    coo = pack_pair_dataset_coo(ds, idx, num_tiles=8, edge_capacity=2048)
    redense = coo.to_dense()
    np.testing.assert_array_equal(dense.atom_ids, coo.atom_ids)
    np.testing.assert_array_equal(dense.mol_id, coo.mol_id)
    np.testing.assert_array_equal(dense.node_mask, coo.node_mask)
    np.testing.assert_array_equal(dense.left_index, coo.left_index)
    np.testing.assert_array_equal(dense.right_index, coo.right_index)
    np.testing.assert_array_equal(dense.adj, redense.adj)
    assert coo.num_edges == dense.num_edges


def test_adj_from_coo_device_matches_host(ds):
    from gcnbmp_tpu.ops.aggregate import adj_from_coo

    coo = pack_pair_dataset_coo(ds, list(range(16)), edge_capacity=1024)
    adj_dev = adj_from_coo(
        jnp.asarray(coo.e_tile), jnp.asarray(coo.e_type),
        jnp.asarray(coo.e_src), jnp.asarray(coo.e_dst),
        jnp.asarray(coo.e_mask), num_tiles=coo.num_tiles, tile=128,
    )
    np.testing.assert_array_equal(np.asarray(adj_dev), coo.to_dense().adj)


def test_native_pack_matches_python(ds):
    from gcnbmp_tpu.data import native_pack

    if not native_pack.native_pack_available():
        pytest.skip("native pack library unavailable")
    cache = native_pack.PairDatasetCache(ds)
    rng = np.random.default_rng(3)
    for trial in range(3):
        idx = rng.permutation(len(ds))[:48].tolist()
        py = pack_pair_dataset_coo(ds, idx, num_tiles=12, edge_capacity=4096)
        nat = native_pack.pack_pairs_native(
            cache, idx, num_tiles=12, edge_capacity=4096
        )
        for field in ("atom_ids", "mol_id", "node_mask", "e_tile", "e_type",
                      "e_src", "e_dst", "e_mask", "left_index", "right_index",
                      "labels"):
            np.testing.assert_array_equal(
                getattr(py, field), getattr(nat, field), err_msg=field
            )


def test_native_pack_dense_matches_python(ds):
    from gcnbmp_tpu.data import native_pack

    if not native_pack.native_pack_available():
        pytest.skip("native pack library unavailable")
    cache = native_pack.PairDatasetCache(ds)
    idx = list(range(24))
    py = pack_pair_dataset_batch(ds, idx, num_tiles=8)
    nat = native_pack.pack_pairs_native(cache, idx, num_tiles=8, want_dense=True)
    np.testing.assert_array_equal(py.adj, nat.adj)
    np.testing.assert_array_equal(py.atom_ids, nat.atom_ids)
    np.testing.assert_array_equal(py.mol_id, nat.mol_id)


def test_coo_predictor_matches_dense_predictor(ds):
    from gcnbmp_tpu.models.packed import coo_batch_args, make_packed_predictor

    idx = list(range(16))
    dense = pack_pair_dataset_batch(ds, idx, num_tiles=4)
    coo = pack_pair_dataset_coo(ds, idx, num_tiles=4, edge_capacity=1024)

    dense_pred = make_packed_predictor(conv_layers=3, weight_tying=False)
    coo_pred = make_packed_predictor(conv_layers=3, weight_tying=False, coo=True)

    dense_args = (
        jnp.asarray(dense.atom_ids), jnp.asarray(dense.adj),
        jnp.asarray(dense.mol_id), jnp.asarray(dense.node_mask),
        jnp.asarray(dense.left_index), jnp.asarray(dense.right_index),
    )
    coo_args = tuple(jnp.asarray(a) for a in coo_batch_args(coo))
    variables = dense_pred.init(jax.random.PRNGKey(0), *dense_args)
    out_dense = dense_pred.apply(variables, *dense_args)
    # identical parameter tree consumed by the COO layout
    out_coo = coo_pred.apply(variables, *coo_args)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_coo), rtol=1e-6, atol=1e-6
    )


def test_compact_coo_predictor_matches_dense(ds):
    from gcnbmp_tpu.models.packed import compact_coo_arrays, make_packed_predictor

    idx = list(range(16))
    dense = pack_pair_dataset_batch(ds, idx, num_tiles=4)
    coo = pack_pair_dataset_coo(ds, idx, num_tiles=4, edge_capacity=1024)

    dense_pred = make_packed_predictor(conv_layers=3, weight_tying=False)
    compact_pred = make_packed_predictor(
        conv_layers=3, weight_tying=False, compact=True
    )
    dense_args = (
        jnp.asarray(dense.atom_ids), jnp.asarray(dense.adj),
        jnp.asarray(dense.mol_id), jnp.asarray(dense.node_mask),
        jnp.asarray(dense.left_index), jnp.asarray(dense.right_index),
    )
    compact_args = tuple(jnp.asarray(a) for a in compact_coo_arrays(coo))
    variables = dense_pred.init(jax.random.PRNGKey(0), *dense_args)
    out_dense = dense_pred.apply(variables, *dense_args)
    out_compact = compact_pred.apply(variables, *compact_args)
    np.testing.assert_allclose(
        np.asarray(out_dense), np.asarray(out_compact), rtol=1e-6, atol=1e-6
    )


def test_compact_encoding_roundtrip(ds):
    from gcnbmp_tpu.models.packed import compact_coo_arrays

    coo = pack_pair_dataset_coo(ds, list(range(24)), edge_capacity=2048)
    nodes, e_packed, n_edges, left, right = compact_coo_arrays(coo)
    t = coo.atom_ids.shape[1]
    sbits = int(t - 1).bit_length()
    np.testing.assert_array_equal(e_packed & (t - 1), coo.e_dst)
    np.testing.assert_array_equal((e_packed >> sbits) & (t - 1), coo.e_src)
    np.testing.assert_array_equal((e_packed >> (2 * sbits)) & 3, coo.e_type)
    np.testing.assert_array_equal(e_packed >> (2 * sbits + 2), coo.e_tile)
    assert int(n_edges) == coo.num_edges
    np.testing.assert_array_equal(nodes[0], coo.atom_ids)
    np.testing.assert_array_equal(nodes[1], coo.mol_id)


def test_native_pack_speed(ds):
    """Native packer must beat the Python COO packer (sanity, not a bench)."""
    import time

    from gcnbmp_tpu.data import native_pack

    if not native_pack.native_pack_available():
        pytest.skip("native pack library unavailable")
    cache = native_pack.PairDatasetCache(ds)
    idx = list(range(64))
    t0 = time.perf_counter()
    for _ in range(5):
        pack_pair_dataset_coo(ds, idx)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        native_pack.pack_pairs_native(cache, idx)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py
