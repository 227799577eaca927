"""GAE (DDI-graph autoencoder baseline) tests."""

import numpy as np

from gcnbmp_tpu.models.gae import (
    mask_test_edges,
    mask_test_edges_from_splits,
    normalize_adj,
    parse_edge_csv,
    train_gae,
)


def _community_graph(n=60, seed=0):
    """Two dense communities — easily reconstructable structure."""
    rng = np.random.default_rng(seed)
    adj = np.zeros((n, n), np.float32)
    half = n // 2
    for block in (slice(0, half), slice(half, n)):
        sub = rng.random((half, half)) < 0.5
        sub = np.triu(sub, 1)
        adj[block, block] = (sub | sub.T).astype(np.float32)
    # sparse cross links
    for _ in range(4):
        i, j = rng.integers(0, half), rng.integers(half, n)
        adj[i, j] = adj[j, i] = 1
    return adj


def test_normalize_adj():
    adj = _community_graph()
    a = normalize_adj(adj)
    assert np.allclose(a, a.T)
    assert np.isfinite(a).all()
    # eigenvalues of sym-normalized adjacency lie in [-1, 1]
    w = np.linalg.eigvalsh(a)
    assert w.max() <= 1.0 + 1e-5


def test_mask_test_edges_disjoint():
    adj = _community_graph()
    m = mask_test_edges(adj, seed=1)
    total_pos = len(m["train_pos"]) + len(m["val_pos"]) + len(m["test_pos"])
    assert total_pos == int(np.triu(adj, 1).sum())
    # held-out edges absent from train adjacency
    for e in np.concatenate([m["val_pos"], m["test_pos"]]):
        assert m["adj_train"][e[0], e[1]] == 0
    # negatives are true non-edges
    for e in np.concatenate([m["val_neg"], m["test_neg"]]):
        assert adj[e[0], e[1]] == 0


def test_mask_test_edges_from_splits_and_csv(tmp_path):
    adj = _community_graph()
    m = mask_test_edges(adj, seed=2)
    # round-trip val/test edges through a pair CSV (the KAIST workflow:
    # train_gcn_cos_multi.py parses label-1/label-0 rows back into edges)
    import pandas as pd

    rows = [(int(a), int(b), 1) for a, b in m["val_pos"]] + [
        (int(a), int(b), 0) for a, b in m["val_neg"]
    ]
    csv = tmp_path / "val.csv"
    pd.DataFrame(rows, columns=["cid_1", "cid_2", "label"]).to_csv(
        csv, index=False
    )
    pos, neg = parse_edge_csv(csv)
    assert np.array_equal(pos, m["val_pos"]) and np.array_equal(neg, m["val_neg"])
    # id-mapped variant
    id2ind = {f"DB{i:05d}": i for i in range(adj.shape[0])}
    rows_id = [(f"DB{a:05d}", f"DB{b:05d}", 1) for a, b in m["val_pos"][:5]]
    csv2 = tmp_path / "val_id.csv"
    pd.DataFrame(
        rows_id, columns=["drugbank_id_1", "drugbank_id_2", "label"]
    ).to_csv(csv2, index=False)
    pos2, _ = parse_edge_csv(csv2, id2ind)
    assert np.array_equal(pos2, m["val_pos"][:5])

    s = mask_test_edges_from_splits(
        adj.shape[0], m["train_pos"], pos, neg, m["test_pos"], m["test_neg"]
    )
    assert np.array_equal(s["adj_train"], m["adj_train"])
    # external splits drive an actual training run
    result = train_gae(adj, epochs=60, seed=0, splits=s)
    assert np.isfinite(result["final_loss"])
    assert 0.0 <= result["val"]["roc_auc"] <= 1.0


def test_train_gae_learns_structure():
    adj = _community_graph()
    result = train_gae(adj, epochs=120, seed=0)
    assert result["embeddings"].shape == (60, 16)
    assert result["test"]["roc_auc"] > 0.75
    assert np.isfinite(result["final_loss"])
