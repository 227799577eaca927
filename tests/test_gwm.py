"""GGNN-GWM encoder + pair predictor tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset, make_batch
from gcnbmp_tpu.models.gwm import (
    GGNN_GWM,
    GWMPairPredictor,
    supernode_features,
    supernode_features_random,
)
from gcnbmp_tpu.models.heads import HolEHead


def _batch():
    f = GGNNFeaturizer()
    ds = PairDataset()
    for s1, s2, y in [("CCO", "c1ccccc1", 1), ("CC(=O)O", "C=O", 0),
                      ("CCN", "CCO", 1)]:
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    return make_batch(
        ds, [0, 1, 2],
        supernode_fn=lambda s: supernode_features(mol_from_smiles(s)),
    )


def test_supernode_features():
    mol = mol_from_smiles("CCO")
    v = supernode_features(mol)
    assert v.shape == (2 + 2 * 4 + 117 * 2,)
    assert np.isfinite(v).all() and v.sum() > 0
    r1 = supernode_features_random(mol, seed=3)
    r2 = supernode_features_random(mol, seed=3)
    np.testing.assert_array_equal(r1, r2)  # deterministic per seed


def test_ggnn_gwm_forward_and_grads():
    batch = _batch()
    model = GGNN_GWM(out_dim=6, hidden_dim=8, hidden_dim_super=8, n_layers=3,
                     n_heads=2)
    args = (jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
            jnp.asarray(batch.super1), jnp.asarray(batch.mask1))
    variables = model.init(jax.random.PRNGKey(0), *args)
    g, aux = model.apply(variables, *args)
    assert g.shape == (3, 6)
    assert aux["super"].shape == (3, 8)

    def loss(p):
        g, _ = model.apply({"params": p}, *args)
        return jnp.sum(g ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(grads))


def test_gwm_supernode_influences_output():
    batch = _batch()
    model = GGNN_GWM(out_dim=6, hidden_dim=8, hidden_dim_super=8, n_layers=2)
    args = (jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
            jnp.asarray(batch.super1), jnp.asarray(batch.mask1))
    variables = model.init(jax.random.PRNGKey(0), *args)
    g1, _ = model.apply(variables, *args)
    g2, _ = model.apply(
        variables, args[0], args[1], args[2] * 0.0 + 1.0, args[3]
    )
    assert not np.allclose(np.asarray(g1), np.asarray(g2))


def test_gwm_pair_predictor():
    batch = _batch()
    pred = GWMPairPredictor(
        encoder=GGNN_GWM(out_dim=8, hidden_dim=8, hidden_dim_super=8,
                         n_layers=2, name="encoder"),
        head=HolEHead(out_dim=1, hidden_dims=(), name="head"),
    )
    args = (jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
            jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
            jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
            jnp.asarray(batch.super1), jnp.asarray(batch.super2))
    variables = pred.init(jax.random.PRNGKey(0), *args)
    out = pred.apply(variables, *args)
    assert out.shape == (3, 1) and np.isfinite(np.asarray(out)).all()


def test_gwm_trainer_end_to_end(tmp_path):
    from gcnbmp_tpu.train import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    f = GGNNFeaturizer()
    oxy = ["CCO", "CC(=O)O", "OCCO", "COC"]
    nox = ["CC", "CCC", "c1ccccc1", "CCN"]
    ds = PairDataset()
    for _ in range(32):
        if rng.random() < 0.5:
            s1, s2, y = rng.choice(oxy), rng.choice(oxy), 1.0
        else:
            s1, s2, y = rng.choice(nox), rng.choice(oxy + nox), 0.0
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    cfg = TrainConfig(
        method="ggnn-gwm", sim_method="hole", fp_hidden_dim=8, fp_out_dim=8,
        conv_layers=2, batch_size=8, learning_rate=5e-3, epochs=6,
        early_stop_patience=100, out_dir=str(tmp_path / "gwm"),
        snapshot_interval=100, seed=0, plot_reports=False,
    )
    result = Trainer(cfg, ds, val_ds=ds).fit()
    log = result["log"]
    assert log[-1]["main/loss"] < log[0]["main/loss"]
    assert np.isfinite(log[-1]["val/roc_auc"])


def _pair_ds(n=12, seed=0):
    rng = np.random.default_rng(seed)
    f = GGNNFeaturizer()
    smis = ["CCO", "c1ccccc1", "CC(=O)O", "C=O", "CCN", "COC"]
    ds = PairDataset()
    for _ in range(n):
        ds.append(
            f(mol_from_smiles(smis[int(rng.integers(len(smis)))])),
            f(mol_from_smiles(smis[int(rng.integers(len(smis)))])),
            np.float32(rng.integers(0, 2)),
        )
    return ds


def test_gwm_packed_padded_parity():
    """Same weights, same molecules + supernode features: the packed GWM
    twin (VERDICT r1 #3) reproduces the padded predictor's logits."""
    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch
    from gcnbmp_tpu.models.packed import make_packed_predictor

    sfn = lambda s: supernode_features(mol_from_smiles(s))
    ds = _pair_ds()
    padded = make_batch(ds, list(range(len(ds))), supernode_fn=sfn)
    pred = GWMPairPredictor(
        encoder=GGNN_GWM(out_dim=8, hidden_dim=8, hidden_dim_super=8,
                         n_layers=3, weight_tying=False, name="encoder"),
        head=HolEHead(out_dim=1, hidden_dims=(), name="head"),
    )
    args = (jnp.asarray(padded.atoms1), jnp.asarray(padded.adj1),
            jnp.asarray(padded.atoms2), jnp.asarray(padded.adj2),
            jnp.asarray(padded.mask1), jnp.asarray(padded.mask2),
            jnp.asarray(padded.super1), jnp.asarray(padded.super2))
    variables = pred.init(jax.random.PRNGKey(0), *args)
    logits_padded = pred.apply(variables, *args)

    packed = pack_pair_dataset_batch(ds, list(range(len(ds))),
                                     supernode_fn=sfn)
    assert packed.supers is not None
    ppred = make_packed_predictor(
        fp_hidden_dim=8, fp_out_dim=8, conv_layers=3, weight_tying=False,
        sim_method="hole", method="ggnn-gwm",
    )
    logits_packed = ppred.apply(
        variables,
        jnp.asarray(packed.atom_ids), jnp.asarray(packed.adj),
        jnp.asarray(packed.supers), jnp.asarray(packed.mol_id),
        jnp.asarray(packed.node_mask), jnp.asarray(packed.left_index),
        jnp.asarray(packed.right_index),
    )
    np.testing.assert_allclose(
        np.asarray(logits_packed), np.asarray(logits_padded),
        rtol=1e-4, atol=1e-5,
    )


def test_gwm_packed_trainer_end_to_end(tmp_path):
    """GWM trains end-to-end on the dense packed fast path."""
    from gcnbmp_tpu.train import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    f = GGNNFeaturizer()
    oxy = ["CCO", "CC(=O)O", "OCCO", "COC"]
    nox = ["CC", "CCC", "c1ccccc1", "CCN"]
    ds = PairDataset()
    for _ in range(32):
        if rng.random() < 0.5:
            s1, s2, y = rng.choice(oxy), rng.choice(oxy), 1.0
        else:
            s1, s2, y = rng.choice(nox), rng.choice(oxy + nox), 0.0
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    cfg = TrainConfig(
        method="ggnn-gwm", sim_method="hole", fp_hidden_dim=8, fp_out_dim=8,
        conv_layers=2, batch_size=8, learning_rate=5e-3, epochs=8,
        early_stop_patience=100, out_dir=str(tmp_path / "gwm_packed"),
        snapshot_interval=100, seed=0, plot_reports=False,
        compute_path="packed",
    )
    result = Trainer(cfg, ds, val_ds=ds).fit()
    log = result["log"]
    assert log[-1]["main/loss"] < log[0]["main/loss"]
    assert np.isfinite(log[-1]["val/roc_auc"])


def test_gwm_coo_compact_padded_parity():
    """The wire-compact COO GWM predictor reproduces the padded logits
    from identical weights (adjacency scatter-built on device; supernode
    table attached via attach_supers_coo)."""
    from gcnbmp_tpu.data.packing import attach_supers_coo, pack_pair_dataset_coo
    from gcnbmp_tpu.models.packed import compact_gwm_arrays, make_packed_predictor

    sfn = lambda s: supernode_features(mol_from_smiles(s))
    ds = _pair_ds()
    padded = make_batch(ds, list(range(len(ds))), supernode_fn=sfn)
    pred = GWMPairPredictor(
        encoder=GGNN_GWM(out_dim=8, hidden_dim=8, hidden_dim_super=8,
                         n_layers=3, weight_tying=False, name="encoder"),
        head=HolEHead(out_dim=1, hidden_dims=(), name="head"),
    )
    args = (jnp.asarray(padded.atoms1), jnp.asarray(padded.adj1),
            jnp.asarray(padded.atoms2), jnp.asarray(padded.adj2),
            jnp.asarray(padded.mask1), jnp.asarray(padded.mask2),
            jnp.asarray(padded.super1), jnp.asarray(padded.super2))
    variables = pred.init(jax.random.PRNGKey(0), *args)
    logits_padded = pred.apply(variables, *args)

    coo = pack_pair_dataset_coo(ds, list(range(len(ds))))
    coo = attach_supers_coo(coo, ds, list(range(len(ds))), sfn)
    cpred = make_packed_predictor(
        fp_hidden_dim=8, fp_out_dim=8, conv_layers=3, weight_tying=False,
        sim_method="hole", method="ggnn-gwm", coo=True, compact=True,
    )
    wire = tuple(jnp.asarray(a) for a in compact_gwm_arrays(coo))
    logits_coo = cpred.apply(variables, *wire)
    np.testing.assert_allclose(
        np.asarray(logits_coo), np.asarray(logits_padded),
        rtol=1e-4, atol=1e-5,
    )


def test_gwm_coo_and_scan_training(tmp_path):
    """GWM trains end-to-end on the streaming COO path, with and without
    scan mode (supers stacked into the lax.scan batch)."""
    from gcnbmp_tpu.train import TrainConfig, Trainer

    rng = np.random.default_rng(0)
    f = GGNNFeaturizer()
    oxy = ["CCO", "CC(=O)O", "OCCO", "COC"]
    nox = ["CC", "CCC", "c1ccccc1", "CCN"]
    ds = PairDataset()
    for _ in range(32):
        if rng.random() < 0.5:
            s1, s2, y = rng.choice(oxy), rng.choice(oxy), 1.0
        else:
            s1, s2, y = rng.choice(nox), rng.choice(oxy + nox), 0.0
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    for scan in (0, 2):
        cfg = TrainConfig(
            method="ggnn-gwm", sim_method="hole", fp_hidden_dim=8,
            fp_out_dim=8, conv_layers=2, batch_size=8, learning_rate=5e-3,
            epochs=6, early_stop_patience=100,
            out_dir=str(tmp_path / f"gwm_coo_{scan}"),
            snapshot_interval=100, seed=0, plot_reports=False,
            compute_path="coo", scan_steps=scan,
        )
        result = Trainer(cfg, ds, val_ds=ds).fit()
        log = result["log"]
        assert log[-1]["main/loss"] < log[0]["main/loss"], scan
        assert np.isfinite(log[-1]["val/roc_auc"]), scan
