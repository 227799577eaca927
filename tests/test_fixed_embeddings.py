"""Fixed-embedding baseline training (mol2vec/SSP-style) tests."""

import numpy as np
import pandas as pd
import pytest

from gcnbmp_tpu.train.fixed import (
    load_embedding_table,
    pair_embeddings,
    train_fixed_embedding_head,
)


def test_load_embedding_table_formats(tmp_path):
    table = {"D1": np.ones(4, np.float32), "D2": np.arange(4, dtype=np.float32)}
    import pickle

    pkl = str(tmp_path / "emb.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(table, f)
    t1 = load_embedding_table(pkl)
    np.testing.assert_array_equal(t1["D2"], table["D2"])

    csv = str(tmp_path / "emb.csv")
    pd.DataFrame({
        "cid": ["D1", "D2"],
        "entity": ["1 1 1 1", "0 1 2 3"],
    }).to_csv(csv, index=False)
    t2 = load_embedding_table(csv)
    np.testing.assert_array_equal(t2["D2"], table["D2"])


def test_pair_embeddings_join(tmp_path):
    table = {f"D{i}": np.full(4, i, np.float32) for i in range(5)}
    csv = str(tmp_path / "pairs.csv")
    pd.DataFrame({
        "drugbank_id_1": ["D0", "D1", "D9"],
        "drugbank_id_2": ["D2", "D3", "D0"],
        "label": [1, 0, 1],
    }).to_csv(csv, index=False)
    e1, e2, y = pair_embeddings(csv, table)
    assert e1.shape == (2, 4)  # D9 row dropped
    np.testing.assert_array_equal(y, [1, 0])


def test_train_fixed_head_learns():
    rng = np.random.default_rng(0)
    n = 2000
    e1 = rng.normal(size=(n, 8)).astype(np.float32)
    e2 = rng.normal(size=(n, 8)).astype(np.float32)
    y = ((e1[:, 0] * e2[:, 0]) > 0).astype(np.float32)  # multiplicative rule
    k = 1600
    out = train_fixed_embedding_head(
        e1[:k], e2[:k], y[:k], val=(e1[k:], e2[k:], y[k:]),
        sim_method="ntn", epochs=40, learning_rate=5e-3, batch_size=128,
    )
    assert out["train_metrics"]["roc_auc"] > 0.95
    assert out["val_metrics"]["roc_auc"] > 0.85
