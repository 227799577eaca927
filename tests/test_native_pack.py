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


def test_collect_logits_coo_matches_padded(ds):
    """Full-dataset eval over the COO layout == the padded eval path,
    including a ragged tail batch."""
    from gcnbmp_tpu.models import set_up_predictor
    from gcnbmp_tpu.models.packed import make_packed_predictor
    from gcnbmp_tpu.train.loop import (
        collect_logits,
        collect_logits_coo,
        make_eval_step,
        make_eval_step_coo,
    )

    predictor = set_up_predictor(
        method="ggnn", fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
        weight_tying=False, sim_method="hole",
    )
    compact_pred = make_packed_predictor(
        fp_hidden_dim=8, fp_out_dim=8, conv_layers=2, weight_tying=False,
        sim_method="hole", compact=True,
    )
    import jax.numpy as jnp

    a = jnp.zeros((2, 16), jnp.int32)
    j = jnp.zeros((2, 4, 16, 16), jnp.float32)
    m = jnp.ones((2, 16), jnp.float32)
    params = predictor.init(jax.random.PRNGKey(1), a, j, a, j, m, m)["params"]

    pad_logits, pad_labels = collect_logits(
        make_eval_step(predictor), params, ds, batch_size=24, pad_to=None
    )
    coo_logits, coo_labels = collect_logits_coo(
        make_eval_step_coo(compact_pred), params, ds, batch_size=24,
        num_tiles=8, edge_capacity=2048,
    )
    assert len(ds) % 24 != 0  # exercises the tail-fill path
    np.testing.assert_array_equal(pad_labels, coo_labels)
    np.testing.assert_allclose(pad_logits, coo_logits, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("attn", ["nie", "para", "pool"])
def test_packed_coattn_matches_padded(ds, attn):
    """PackedCoattnPairPredictor over the COO layout == the padded
    PairPredictor with co-attention, same weights (reference forward
    train_binary.py:84-118)."""
    from gcnbmp_tpu.models import set_up_predictor
    from gcnbmp_tpu.models.packed import (
        compact_coattn_arrays,
        make_packed_predictor,
    )
    from gcnbmp_tpu.train.loop import (
        collect_logits,
        collect_logits_coo,
        make_eval_step,
        make_eval_step_coo,
    )

    predictor = set_up_predictor(
        method="ggnn", fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
        weight_tying=False, sim_method="hole", attn_model=attn,
    )
    packed_pred = make_packed_predictor(
        fp_hidden_dim=8, fp_out_dim=8, conv_layers=2, weight_tying=False,
        sim_method="hole", attn=attn,
    )
    a = jnp.zeros((2, 16), jnp.int32)
    j = jnp.zeros((2, 4, 16, 16), jnp.float32)
    m = jnp.ones((2, 16), jnp.float32)
    params = predictor.init(jax.random.PRNGKey(1), a, j, a, j, m, m)["params"]

    pad_logits, pad_labels = collect_logits(
        make_eval_step(predictor), params, ds, batch_size=24, pad_to=None
    )
    n_max = 48
    coo_logits, coo_labels = collect_logits_coo(
        make_eval_step_coo(packed_pred), params, ds, batch_size=24,
        num_tiles=8, edge_capacity=2048,
        args_fn=lambda b: compact_coattn_arrays(b, n_max),
    )
    np.testing.assert_array_equal(pad_labels, coo_labels)
    np.testing.assert_allclose(pad_logits, coo_logits, rtol=1e-5, atol=1e-5)


def test_molecule_slot_table():
    from gcnbmp_tpu.data.packing import molecule_slot_table

    # 3 molecules scattered over 2 tiles of 4 slots; tile-flat order:
    # mol ids [0,0,1,3, 1,1,2,3]  (3 == num_mols == padding)
    mol_id = np.array([[0, 0, 1, 3], [1, 1, 2, 3]], np.int32)
    slots, mask = molecule_slot_table(mol_id, num_mols=3, n_max=4)
    np.testing.assert_array_equal(slots[0], [0, 1, 0, 0])
    np.testing.assert_array_equal(slots[1], [2, 4, 5, 0])
    np.testing.assert_array_equal(slots[2], [6, 0, 0, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(mask[1], [1, 1, 1, 0])
    np.testing.assert_array_equal(mask[2], [1, 0, 0, 0])


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
