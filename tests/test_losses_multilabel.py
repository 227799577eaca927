"""Loss variants + multi-label training path (the x37/x86 trainer,
reference train_ggnn_hole_multi_class_x37.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset
from gcnbmp_tpu.data.parsers import CSVPairParser
from gcnbmp_tpu.models import ENCODERS
from gcnbmp_tpu.train import TrainConfig, Trainer
from gcnbmp_tpu.train.loop import (
    hinge_loss,
    make_loss,
    sigmoid_cross_entropy,
    sigmoid_focal_loss,
)


def test_losses_basic_values():
    logits = jnp.asarray([10.0, -10.0])
    labels = jnp.asarray([1.0, 0.0])
    assert float(sigmoid_cross_entropy(logits, labels)) < 1e-3
    assert float(hinge_loss(logits, labels)) == 0.0
    assert float(sigmoid_focal_loss(logits, labels)) < 1e-4
    # wrong predictions: focal < ce scaling sanity, hinge positive
    wrong = jnp.asarray([-2.0, 2.0])
    assert float(hinge_loss(wrong, labels)) > 1.0
    assert float(sigmoid_focal_loss(wrong, labels)) > 0
    # ignore labels
    labels_ig = jnp.asarray([1.0, -1.0])
    assert float(sigmoid_cross_entropy(jnp.asarray([10.0, 0.0]), labels_ig)) < 1e-3


def test_make_loss_dispatch():
    assert make_loss("sigmoid_ce") is sigmoid_cross_entropy
    assert make_loss("hinge") is hinge_loss
    fl = make_loss("focal", gamma=1.0, alpha=0.5)
    assert float(fl(jnp.asarray([0.0]), jnp.asarray([1.0]))) > 0
    with pytest.raises(ValueError):
        make_loss("nope")


def _multilabel_df(n=60, seed=0):
    import pandas as pd

    oxy = ["CCO", "CC(=O)O", "OCCO", "COC"]
    nox = ["CC", "CCC", "CCN", "C#N"]
    arom = ["c1ccccc1", "Cc1ccccc1", "c1ccncc1"]
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kinds = []
        s1 = rng.choice(oxy + nox + arom)
        s2 = rng.choice(oxy + nox + arom)
        if "O" in s1 + s2:
            kinds.append("has_oxygen")
        if "1" in s1 + s2:
            kinds.append("has_ring")
        if not kinds:
            kinds.append("neither")
        rows.append({"smiles_1": s1, "smiles_2": s2, "label": "||".join(kinds)})
    return pd.DataFrame(rows)


def test_multilabel_parse_and_train(tmp_path):
    classes = ["has_oxygen", "has_ring", "neither"]
    parser = CSVPairParser(multi_label_classes=classes)
    df = _multilabel_df()
    res = parser.parse(df)
    ds = res.dataset
    assert ds.labels[0].shape == (3,)
    cfg = TrainConfig(
        method="ggnn", sim_method="hole", class_num=3, fp_hidden_dim=8,
        fp_out_dim=8, conv_layers=2, batch_size=8, learning_rate=5e-3,
        epochs=12, early_stop_patience=100, out_dir=str(tmp_path / "out"),
        snapshot_interval=100, seed=0,
    )
    result = Trainer(cfg, ds, val_ds=parser.parse(_multilabel_df(seed=1)).dataset).fit()
    log = result["log"]
    assert log[-1]["main/loss"] < log[0]["main/loss"]
    assert log[-1]["train/roc_auc"] > 0.8  # easily learnable labels


def test_multilabel_eval_cli_roundtrip(tmp_path):
    """Train a tiny multi-label run, then drive eval.py with --labels-csv
    (the offline multilabel evaluation workflow; without the flag the
    CLI must refuse rather than misparse ||-labels)."""
    import os
    import sys

    import pandas as pd

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import eval as eval_cli

    classes = ["has_oxygen", "has_ring", "neither"]
    train_csv = tmp_path / "train.csv"
    test_csv = tmp_path / "test.csv"
    _multilabel_df(40, seed=0).to_csv(train_csv, index=False)
    _multilabel_df(20, seed=1).to_csv(test_csv, index=False)
    labels_csv = tmp_path / "labels.csv"
    pd.DataFrame({"label": classes}).to_csv(labels_csv, index=False)

    parser = CSVPairParser(multi_label_classes=classes)
    ds = parser.parse(pd.read_csv(train_csv)).dataset
    out = tmp_path / "run"
    cfg = TrainConfig(
        method="ggnn", sim_method="hole", class_num=3, fp_hidden_dim=8,
        fp_out_dim=8, conv_layers=2, batch_size=8, epochs=2,
        early_stop_patience=100, out_dir=str(out), snapshot_interval=100,
        seed=0,
    )
    Trainer(cfg, ds, None).fit()
    with open(out / "config.json", "w") as f:  # train.py CLI writes this
        f.write(cfg.to_json())

    rc = eval_cli.main([
        "--test", str(test_csv), "--run", str(out), "--checkpoint", "final",
        "--labels-csv", str(labels_csv), "--out", str(tmp_path / "ev"),
    ])
    assert rc == 0
    import json

    metrics = json.load(open(tmp_path / "ev" / "eval_result.json"))
    assert 0.0 <= metrics["roc_auc"] <= 1.0

    with pytest.raises(SystemExit):  # refuses without --labels-csv
        eval_cli.main([
            "--test", str(test_csv), "--run", str(out),
            "--checkpoint", "final", "--out", str(tmp_path / "ev2"),
        ])


def test_hinge_training_runs(tmp_path):
    f = GGNNFeaturizer()
    ds = PairDataset()
    rng = np.random.default_rng(0)
    for _ in range(24):
        s1 = rng.choice(["CCO", "CC", "C=O", "CCN"])
        s2 = rng.choice(["CCO", "CC"])
        y = 1.0 if ("O" in s1 and "O" in s2) else 0.0
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    cfg = TrainConfig(
        fp_hidden_dim=8, fp_out_dim=8, conv_layers=2, batch_size=8,
        epochs=4, loss="hinge", out_dir=str(tmp_path / "o"),
        snapshot_interval=100, early_stop_patience=100, seed=0,
    )
    result = Trainer(cfg, ds, None).fit()
    assert np.isfinite(result["log"][-1]["main/loss"])


@pytest.mark.parametrize("method", ["ggnn-dev", "ggnn-dev-fuse",
                                    "ggnn-dev-gate", "ggnn-dev-self-loop"])
def test_dev_variants_in_predictor(method):
    import jax

    from gcnbmp_tpu.data.dataset import make_batch
    from gcnbmp_tpu.models import set_up_predictor

    f = GGNNFeaturizer()
    ds = PairDataset()
    ds.append(f(mol_from_smiles("CCO")), f(mol_from_smiles("CC")), np.float32(1))
    batch = make_batch(ds, [0])
    pred = set_up_predictor(method=method, fp_hidden_dim=8, fp_out_dim=8,
                            conv_layers=2, sim_method="mlp")
    variables = pred.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
        jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
        jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
    )
    out = pred.apply(
        variables, jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
        jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
        jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
    )
    assert out.shape == (1, 1) and np.isfinite(np.asarray(out)).all()


def test_focal_loss_finite_with_ignored_labels_noninteger_gamma():
    """Round-4 review finding: with raw -1 (ignored) labels,
    (1-p_t)**gamma is NaN for non-integer gamma and NaN*0 masking does
    not sanitize it — labels must be clamped before the math.  Loss
    and grads stay finite, and the ignored element contributes zero
    gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gcnbmp_tpu.train.loop import sigmoid_focal_loss

    logits = jnp.asarray([-2.0, 1.0, 0.5])
    labels = jnp.asarray([-1.0, 1.0, 0.0])
    for gamma in (1.5, 2.0, 2.5):
        l = sigmoid_focal_loss(logits, labels, gamma=gamma)
        assert np.isfinite(float(l)), gamma
        g = jax.grad(
            lambda x: sigmoid_focal_loss(x, labels, gamma=gamma))(logits)
        g = np.asarray(g)
        assert np.isfinite(g).all(), (gamma, g)
        assert g[0] == 0.0  # ignored element
