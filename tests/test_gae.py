"""GAE (DDI-graph autoencoder baseline) tests."""

import numpy as np

from gcnbmp_tpu.models.gae import mask_test_edges, normalize_adj, train_gae


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


def test_train_gae_learns_structure():
    adj = _community_graph()
    result = train_gae(adj, epochs=120, seed=0)
    assert result["embeddings"].shape == (60, 16)
    assert result["test"]["roc_auc"] > 0.75
    assert np.isfinite(result["final_loss"])
