"""Gather-only-VJP slot-table op (ops/slotgather.py): forward
bit-parity and grad parity vs the plain jnp.take form, plus the
packed-layout contiguity invariant it relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset
from gcnbmp_tpu.data.packing import (
    molecule_slot_table,
    pack_pair_dataset_coo,
)
from gcnbmp_tpu.ops.slotgather import (
    gather_slot_table,
    identity_mol_row,
    side_mol_row,
)

SMILES = [
    "CCO", "c1ccccc1", "CC(=O)Oc1ccccc1C(=O)O", "C=O", "CCN(CC)CC",
    "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "O",
]


def _coo_batch(n_pairs=6, seed=0):
    f = GGNNFeaturizer()
    rng = np.random.default_rng(seed)
    ds = PairDataset()
    for _ in range(n_pairs):
        s1 = SMILES[int(rng.integers(len(SMILES)))]
        s2 = SMILES[int(rng.integers(len(SMILES)))]
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)),
                  np.float32(rng.integers(0, 2)))
    return pack_pair_dataset_coo(ds, list(range(n_pairs)))


def test_contiguity_invariant():
    """The invariant the gather-only VJP rests on: every molecule's
    slot run is contiguous (slots[m, j] == slots[m, 0] + j under the
    mask) and each flat slot appears in at most one masked-in entry."""
    b = _coo_batch()
    n_max = 32
    slots, mask = molecule_slot_table(b.mol_id, b.num_mols, n_max)
    j = np.arange(n_max)[None, :]
    assert np.all((slots == slots[:, :1] + j) | (mask == 0))
    used = slots[mask > 0]
    assert len(used) == len(np.unique(used))


def _loss_take(flat, slots, amask):
    atoms = jnp.take(flat, slots.reshape(-1), axis=0).reshape(
        slots.shape + (flat.shape[-1],)) * amask[..., None]
    return jnp.sum(jnp.tanh(atoms) * atoms), atoms


def test_gather_slot_table_matches_take():
    b = _coo_batch()
    n_max = 32
    slots, mask = molecule_slot_table(b.mol_id, b.num_mols, n_max)
    rng = np.random.default_rng(1)
    flat = jnp.asarray(
        rng.normal(size=(b.mol_id.size, 8)).astype(np.float32))
    ids = jnp.asarray(b.mol_id.reshape(-1))
    mol_row = identity_mol_row(b.num_mols)

    def loss_op(x):
        atoms = gather_slot_table(x, jnp.asarray(slots), jnp.asarray(mask),
                                  ids, mol_row)
        return jnp.sum(jnp.tanh(atoms) * atoms), atoms

    (l_ref, a_ref), g_ref = jax.value_and_grad(
        lambda x: _loss_take(x, jnp.asarray(slots), jnp.asarray(mask)),
        has_aux=True)(flat)
    (l_op, a_op), g_op = jax.value_and_grad(loss_op, has_aux=True)(flat)
    np.testing.assert_array_equal(np.asarray(a_ref), np.asarray(a_op))
    np.testing.assert_allclose(float(l_ref), float(l_op), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_op),
                               rtol=1e-6, atol=1e-6)


def test_gather_slot_table_side_tables():
    """The co-attention case: per-pair tables over one side each —
    grads must land only on that side's slots and match plain take."""
    b = _coo_batch()
    n_max = 32
    slots, mask = molecule_slot_table(b.mol_id, b.num_mols, n_max)
    rng = np.random.default_rng(2)
    flat = jnp.asarray(
        rng.normal(size=(b.mol_id.size, 4)).astype(np.float32))
    ids = jnp.asarray(b.mol_id.reshape(-1))
    for index in (b.left_index, b.right_index):
        s = jnp.asarray(slots[index])
        m = jnp.asarray(mask[index])
        mol_row = side_mol_row(jnp.asarray(index), b.num_mols)

        g_ref = jax.grad(lambda x: _loss_take(x, s, m)[0])(flat)
        g_op = jax.grad(lambda x: jnp.sum(jnp.tanh(
            gather_slot_table(x, s, m, ids, mol_row)
        ) * gather_slot_table(x, s, m, ids, mol_row)))(flat)
        np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_op),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("flag", [True, False])
def test_set2set_dense_grad_parity_flag(monkeypatch, flag):
    """PackedSet2Set dense mode: GCNBMP_GATHER_VJP on/off give the same
    loss and parameter gradients."""
    from gcnbmp_tpu.models import packed as packed_mod
    from gcnbmp_tpu.models.packed import PackedSet2Set

    b = _coo_batch()
    rng = np.random.default_rng(3)
    ch = 6
    h = jnp.asarray(rng.normal(
        size=b.mol_id.shape + (ch,)).astype(np.float32))
    mod = PackedSet2Set(ch, processing_steps=2, dense_n_max=32)
    monkeypatch.setattr(packed_mod, "SET2SET_DENSE", True)
    monkeypatch.setattr(packed_mod, "GATHER_VJP", True)
    params = mod.init(jax.random.PRNGKey(0), h, jnp.asarray(b.mol_id),
                      jnp.asarray(b.node_mask), b.num_mols)

    def loss(p, hh):
        out = mod.apply(p, hh, jnp.asarray(b.mol_id),
                        jnp.asarray(b.node_mask), b.num_mols)
        return jnp.sum(out ** 2)

    monkeypatch.setattr(packed_mod, "GATHER_VJP", flag)
    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(params, h)
    monkeypatch.setattr(packed_mod, "GATHER_VJP", not flag)
    l2, g2 = jax.value_and_grad(loss, argnums=(0, 1))(params, h)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


def test_coattn_predictor_grad_parity(monkeypatch):
    """PackedCoattnPairPredictor loss + grads identical with the
    gather-only VJP on and off."""
    from gcnbmp_tpu.models import packed as packed_mod
    from gcnbmp_tpu.models.packed import (
        compact_coattn_arrays,
        make_packed_predictor,
    )

    b = _coo_batch()
    n_max = 32
    pred = make_packed_predictor(
        fp_hidden_dim=8, fp_out_dim=8, conv_layers=2, weight_tying=True,
        sim_method="hole", attn="nie",
    )
    args = tuple(jnp.asarray(a) for a in compact_coattn_arrays(b, n_max))
    params = pred.init(jax.random.PRNGKey(0), *args)

    def loss(p):
        return jnp.sum(pred.apply(p, *args) ** 2)

    monkeypatch.setattr(packed_mod, "GATHER_VJP", True)
    l1, g1 = jax.value_and_grad(loss)(params)
    monkeypatch.setattr(packed_mod, "GATHER_VJP", False)
    l2, g2 = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, c in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-6)


def test_device_mol_runs_matches_numpy():
    """_device_mol_runs (searchsorted-only starts/counts) vs a direct
    numpy computation over real packed batches from both packers
    (pack_pair_dataset_coo and pack_pair_dataset_batch)."""
    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch
    from gcnbmp_tpu.models.packed import _device_mol_runs

    for seed in (0, 5):
        b = _coo_batch(n_pairs=7, seed=seed)
        f = GGNNFeaturizer()
        rng = np.random.default_rng(seed + 100)
        ds = PairDataset()
        for _ in range(7):
            s1 = SMILES[int(rng.integers(len(SMILES)))]
            s2 = SMILES[int(rng.integers(len(SMILES)))]
            ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)),
                      np.float32(rng.integers(0, 2)))
        bb = pack_pair_dataset_batch(ds, list(range(7)))
        for mol_id, num_mols in ((b.mol_id, b.num_mols),
                                 (bb.mol_id, bb.num_mols)):
            starts, counts = jax.jit(
                _device_mol_runs, static_argnums=1
            )(jnp.asarray(mol_id), num_mols)
            flat = mol_id.reshape(-1)
            for m in range(num_mols):
                pos = np.nonzero(flat == m)[0]
                assert counts[m] == len(pos)
                if len(pos):
                    assert starts[m] == pos[0]
                    # contiguity invariant
                    np.testing.assert_array_equal(
                        pos, pos[0] + np.arange(len(pos)))


def test_mol_sum_dense_matches_segment():
    """_mol_sum_dense == _segment_mol_sum (values and grads) on a real
    packed batch."""
    from gcnbmp_tpu.models.packed import _mol_sum_dense, _segment_mol_sum

    b = _coo_batch(n_pairs=6, seed=4)
    rng = np.random.default_rng(7)
    g_nodes = jnp.asarray(rng.normal(
        size=b.mol_id.shape + (5,)).astype(np.float32))
    mol_id = jnp.asarray(b.mol_id)

    def l_seg(x):
        return jnp.sum(_segment_mol_sum(x, mol_id, b.num_mols) ** 2)

    def l_dense(x):
        return jnp.sum(_mol_sum_dense(x, mol_id, b.num_mols, 32) ** 2)

    v1, g1 = jax.value_and_grad(l_seg)(g_nodes)
    v2, g2 = jax.value_and_grad(l_dense)(g_nodes)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_mol_sum_dense_overflow_poisons():
    from gcnbmp_tpu.models.packed import _mol_sum_dense

    b = _coo_batch(n_pairs=6, seed=4)
    g_nodes = jnp.ones(b.mol_id.shape + (3,), jnp.float32)
    out = _mol_sum_dense(g_nodes, jnp.asarray(b.mol_id), b.num_mols, 2)
    assert np.isnan(np.asarray(out)).all()
