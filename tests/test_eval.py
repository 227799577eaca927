"""Eval/analysis layer tests: evaluator + exports, similarity matrices,
correlation analysis, saliency, SVG rendering, classical baselines."""

import json
import os

import jax
import numpy as np
import pytest

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset, make_batch
from gcnbmp_tpu.eval.analysis import embedding_ddi_correlation
from gcnbmp_tpu.eval.baselines import ecfp_features, run_baseline
from gcnbmp_tpu.eval.evaluate import evaluate_dataset
from gcnbmp_tpu.eval.saliency import atom_saliency, render_molecule_svg
from gcnbmp_tpu.eval.similarity import (
    continuous_jaccard_matrix,
    cosine_similarity_matrix,
    extended_jaccard_matrix,
    similarity_csv,
)
from gcnbmp_tpu.models import set_up_predictor


def _dataset_and_csv(tmp_path, n=10):
    import csv

    smiles = ["CCO", "CC(=O)O", "c1ccccc1", "CCN", "C=O", "COC"]
    rng = np.random.default_rng(0)
    f = GGNNFeaturizer()
    ds = PairDataset()
    path = str(tmp_path / "test.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["drugbank_id_1", "drugbank_id_2", "smiles_1", "smiles_2", "label"])
        for i in range(n):
            s1 = smiles[int(rng.integers(len(smiles)))]
            s2 = smiles[int(rng.integers(len(smiles)))]
            y = int(rng.integers(0, 2))
            w.writerow([f"D{i}", f"D{i+1}", s1, s2, y])
            ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    return ds, path


def _predictor_and_params(ds):
    pred = set_up_predictor(
        method="ggnn", fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
        sim_method="hole",
    )
    batch = make_batch(ds, [0, 1])
    import jax.numpy as jnp

    variables = pred.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
        jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
        jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
    )
    return pred, variables["params"]


def test_evaluate_dataset_exports(tmp_path):
    ds, csv_path = _dataset_and_csv(tmp_path)
    pred, params = _predictor_and_params(ds)
    out = str(tmp_path / "eval")
    result = evaluate_dataset(
        pred, params, ds, out_dir=out, source_csv=csv_path, batch_size=4
    )
    assert result.e1.shape == (len(ds), 8)
    assert set(result.metrics) >= {"accuracy", "roc_auc", "prc_auc", "f1"}
    assert os.path.exists(os.path.join(out, "eval_result.json"))
    assert os.path.exists(os.path.join(out, "test_e.csv"))
    assert os.path.exists(os.path.join(out, "test_e_y.csv"))
    assert os.path.exists(os.path.join(out, "drug_list_with_representation.csv"))
    with open(os.path.join(out, "eval_result.json")) as f:
        saved = json.load(f)
    assert saved["accuracy"] == result.metrics["accuracy"]
    import pandas as pd

    ey = pd.read_csv(os.path.join(out, "test_e_y.csv"))
    assert "e1" in ey.columns and "y" in ey.columns
    assert ((ey["y"] >= 0) & (ey["y"] <= 1)).all()


@pytest.mark.parametrize("method,attn", [("ggnn", None), ("relgcn", None),
                                          ("ggnn", "nie")])
def test_packed_evaluator_matches_padded(tmp_path, method, attn):
    """evaluate_dataset with train_cfg routed to the packed COO fast path
    produces the padded evaluator's logits, embeddings, and metrics."""
    from gcnbmp_tpu.train import TrainConfig

    ds, csv_path = _dataset_and_csv(tmp_path)
    pred = set_up_predictor(
        method=method, fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
        sim_method="hole", attn_model=attn,
    )
    batch = make_batch(ds, [0, 1])
    import jax.numpy as jnp

    variables = pred.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
        jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
        jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
    )
    params = variables["params"]
    cfg = TrainConfig(
        method=method, sim_method="hole", attn=attn, fp_hidden_dim=8,
        fp_out_dim=8, conv_layers=2, compute_path="coo", batch_size=4,
        out_dir=str(tmp_path / "run"),
    )
    padded = evaluate_dataset(pred, params, ds, batch_size=4)
    packed = evaluate_dataset(pred, params, ds, batch_size=4, train_cfg=cfg)
    np.testing.assert_allclose(packed.logits, padded.logits,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(packed.e1, padded.e1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(packed.e2, padded.e2, rtol=1e-4, atol=1e-5)
    assert packed.metrics["accuracy"] == padded.metrics["accuracy"]


def test_packed_evaluator_large_first_pair_tail_batch(tmp_path):
    """Regression: tail batches fill with the SMALLEST pair — a dataset
    whose first pair is much larger than average must not overflow the
    static tile/edge capacity when the row count is not a multiple of
    the batch size."""
    from gcnbmp_tpu.train import TrainConfig

    f = GGNNFeaturizer()
    big = "CC(C)Cc1ccc(cc1)C(C)C(=O)OCCOC(=O)c1ccccc1OC(=O)CCCCCCCC"
    ds = PairDataset()
    ds.append(f(mol_from_smiles(big)), f(mol_from_smiles(big)),
              np.float32(1))
    for i in range(9):
        ds.append(f(mol_from_smiles("CCO")), f(mol_from_smiles("CO")),
                  np.float32(i % 2))
    pred = set_up_predictor(
        method="ggnn", fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
        sim_method="hole",
    )
    batch = make_batch(ds, [0, 1])
    import jax.numpy as jnp

    variables = pred.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
        jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
        jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
    )
    cfg = TrainConfig(
        method="ggnn", sim_method="hole", fp_hidden_dim=8, fp_out_dim=8,
        conv_layers=2, compute_path="coo", batch_size=8,
        out_dir=str(tmp_path / "run"),
    )
    padded = evaluate_dataset(pred, variables["params"], ds, batch_size=8)
    packed = evaluate_dataset(pred, variables["params"], ds, batch_size=8,
                              train_cfg=cfg)
    np.testing.assert_allclose(packed.logits, padded.logits,
                               rtol=1e-4, atol=1e-5)


def test_similarity_matrices():
    rng = np.random.default_rng(0)
    emb = np.abs(rng.normal(size=(5, 8)))
    for fn in (continuous_jaccard_matrix, extended_jaccard_matrix,
               cosine_similarity_matrix):
        m = fn(emb)
        assert m.shape == (5, 5)
        np.testing.assert_allclose(np.diag(m), 1.0, rtol=1e-6)
        np.testing.assert_allclose(m, m.T, rtol=1e-6)
        assert (m <= 1.0 + 1e-9).all()
    df = similarity_csv(emb, list("abcde"), method="cosine")
    assert df.loc["a", "a"] == pytest.approx(1.0)


def test_correlation_plot_writes_png(tmp_path):
    from gcnbmp_tpu.eval.analysis import correlation_plot

    rng = np.random.default_rng(0)
    c = rng.integers(0, 20, 200).astype(float)
    s = 0.03 * c + rng.normal(0, 0.1, 200)
    out = str(tmp_path / "corr.png")
    correlation_plot(s, c, 0.78, out)
    assert os.path.getsize(out) > 1000


def test_embedding_ddi_correlation_detects_structure():
    # two clusters: drugs with similar embeddings share interactions
    rng = np.random.default_rng(0)
    base1, base2 = rng.normal(size=8), rng.normal(size=8)
    emb = np.stack([base1 + 0.01 * rng.normal(size=8) for _ in range(5)]
                   + [base2 + 0.01 * rng.normal(size=8) for _ in range(5)])
    ddi = np.zeros((10, 10))
    ddi[:5, :3] = 1   # cluster 1 interacts with targets 0-2
    ddi[5:, 3:6] = 1  # cluster 2 with targets 3-5
    ddi = np.maximum(ddi, ddi.T)  # interaction matrices are symmetric
    corr, s, c = embedding_ddi_correlation(emb, ddi)
    assert corr > 0.5  # same-cluster pairs share partners AND embeddings


def test_atom_saliency_methods(tmp_path):
    ds, _ = _dataset_and_csv(tmp_path, n=4)
    pred, params = _predictor_and_params(ds)
    batch = make_batch(ds, [0, 1])
    for method in ["gradient", "integrated", "bayes"]:
        sal = atom_saliency(
            pred, params, batch.atoms1, batch.adj1, batch.atoms2, batch.adj2,
            batch.mask1, batch.mask2, method=method, steps=4, n_samples=2,
        )
        assert sal["mol1"].shape == batch.atoms1.shape
        assert np.all(np.isfinite(sal["mol1"])), method
        assert sal["mol1"].max() > 0, method


def test_atom_saliency_relgcn(tmp_path):
    # RelGCN's float path is DrugFP features, not embeddings; saliency
    # must still work by cloning with pre_embedded=True (VERDICT missing #1)
    import jax.numpy as jnp

    ds, _ = _dataset_and_csv(tmp_path, n=4)
    pred = set_up_predictor(
        method="relgcn", fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
        sim_method="hole",
    )
    batch = make_batch(ds, [0, 1])
    variables = pred.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
        jnp.asarray(batch.atoms2), jnp.asarray(batch.adj2),
        jnp.asarray(batch.mask1), jnp.asarray(batch.mask2),
    )
    sal = atom_saliency(
        pred, variables["params"], batch.atoms1, batch.adj1,
        batch.atoms2, batch.adj2, batch.mask1, batch.mask2,
    )
    assert sal["mol1"].shape == batch.atoms1.shape
    assert np.all(np.isfinite(sal["mol1"]))
    assert sal["mol1"].max() > 0


def test_render_molecule_svg():
    mol = mol_from_smiles("CC(=O)Oc1ccccc1C(=O)O")
    vals = np.linspace(0, 1, mol.num_atoms)
    svg = render_molecule_svg(mol, vals)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<circle") == mol.num_atoms
    assert svg.count("<line") == mol.num_bonds


def test_classical_baseline_learns():
    rng = np.random.default_rng(0)
    # learnable rule: label = sign of first feature sum
    e1 = rng.normal(size=(120, 8))
    e2 = rng.normal(size=(120, 8))
    y = ((e1[:, 0] + e2[:, 0]) > 0).astype(int)
    m = run_baseline("lr", e1[:80], e2[:80], y[:80], e1[80:], e2[80:], y[80:])
    assert m["roc_auc"] > 0.9


def test_ecfp_features_consistency():
    x = ecfp_features(["CCO", "CCO", "c1ccccc1"], n_bits=256, radius=1)
    np.testing.assert_array_equal(x[0], x[1])
    assert not np.array_equal(x[0], x[2])
    assert x.sum() > 0
