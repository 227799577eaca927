"""GGNN optional machinery: self-attention, aggregators, edge network,
set2vec, context — build/run/grad smoke tests + targeted checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
from gcnbmp_tpu.data.dataset import PairDataset, make_batch
from gcnbmp_tpu.models import GGNN
from gcnbmp_tpu.models.ggnn_extras import (
    GGNNEdgeNetwork,
    LayerAggregator,
    MaskedSelfAttention,
    Set2Vec,
)


def _batch():
    f = GGNNFeaturizer()
    ds = PairDataset()
    for s1, s2, y in [("CCO", "c1ccccc1", 1), ("CC(=O)O", "C=O", 0)]:
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    return make_batch(ds, [0, 1])


def _run_ggnn(**kwargs):
    batch = _batch()
    model = GGNN(out_dim=6, hidden_dim=8, n_layers=3, **kwargs)
    args = (jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
            jnp.asarray(batch.mask1))
    variables = model.init(jax.random.PRNGKey(0), *args)
    g, aux = model.apply(variables, *args)
    assert np.all(np.isfinite(np.asarray(g))), kwargs
    return g, aux, variables


@pytest.mark.parametrize("agg", ["concat", "max-pool", "lstm", "gru",
                                 "lstm-attn", "gru-attn", "attn"])
def test_layer_aggregators(agg):
    g, aux, _ = _run_ggnn(layer_aggregator=agg)
    assert g.shape == (2, 6)
    assert len(aux["h_list"]) == 3


def test_self_attn_aggregator_unfinished_in_reference():
    with pytest.raises(NotImplementedError):
        _run_ggnn(layer_aggregator="self-attn")


def test_masked_self_attention():
    g, _, _ = _run_ggnn(use_attention=True)
    assert g.shape == (2, 6)
    # attention respects the adjacency mask: a single-neighbor atom's
    # output is exactly elu(W h_neighbor) (all weight on that neighbor)
    attn = MaskedSelfAttention(hidden_dim=8)
    h = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 8)), jnp.float32)
    adj = jnp.zeros((1, 4, 4, 4))
    adj = adj.at[0, 0, 0, 1].set(1.0).at[0, 0, 1, 0].set(1.0)
    v = attn.init(jax.random.PRNGKey(0), h, adj)
    out = np.asarray(attn.apply(v, h, adj))
    assert np.all(np.isfinite(out))
    wh = np.asarray(h[0] @ v["params"]["linear_transform"]["kernel"])
    elu = lambda x: np.where(x > 0, x, np.expm1(x))
    np.testing.assert_allclose(out[0, 0], elu(wh[1]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], elu(wh[0]), rtol=1e-5, atol=1e-6)


def test_update_attention_raises_with_reference_citation():
    with pytest.raises(NotImplementedError, match="update_with_attention"):
        _run_ggnn(update_attention=True)


def test_edge_network_message_function():
    g, _, _ = _run_ggnn(message_function="edge_network")
    assert g.shape == (2, 6)
    # factored EdgeNetwork equals the per-pair definition
    rng = np.random.default_rng(0)
    h = rng.normal(size=(2, 5, 8)).astype(np.float32)
    adj = np.zeros((2, 4, 5, 5), np.float32)
    adj[0, 1, 0, 1] = adj[0, 1, 1, 0] = 1
    net = GGNNEdgeNetwork(node_dim=8)
    v = net.init(jax.random.PRNGKey(0), jnp.asarray(h), jnp.asarray(adj))
    out = np.asarray(net.apply(v, jnp.asarray(h), jnp.asarray(adj)))
    p = jax.device_get(v["params"])
    basis = np.concatenate([np.zeros((1, 4)), np.eye(4)]).astype(np.float32)
    mats = (basis @ p["output"]["kernel"] + p["output"]["bias"]).reshape(5, 8, 8)
    ref = np.zeros((2, 5, 8), np.float32)
    for b in range(2):
        for i in range(5):
            for j in range(5):
                e = adj[b, :, i, j]
                t = int(np.argmax(e)) + 1 if e.any() else 0
                ref[b, i] += mats[t] @ h[b, j]
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_set2vec_readout():
    g, _, _ = _run_ggnn(readout_function="set2vec")
    assert g.shape == (2, 6)
    s2v = Set2Vec(node_dim=8, output_dim=5, num_timesteps=2)
    h = jnp.asarray(np.random.default_rng(0).normal(size=(3, 7, 8)), jnp.float32)
    v = s2v.init(jax.random.PRNGKey(0), h)
    out = s2v.apply(v, h)
    assert out.shape == (3, 5)


def test_context_bilstm():
    g, _, _ = _run_ggnn(context=True)
    assert g.shape == (2, 6)


def test_concat_hidden_with_set2vec():
    g, _, _ = _run_ggnn(concat_hidden=True, readout_function="set2vec")
    assert g.shape == (2, 18)  # 3 layers x out_dim


def test_aggregator_grads_finite():
    batch = _batch()
    for agg in ["gru-attn", "lstm"]:
        model = GGNN(out_dim=4, hidden_dim=8, n_layers=2, layer_aggregator=agg)
        args = (jnp.asarray(batch.atoms1), jnp.asarray(batch.adj1),
                jnp.asarray(batch.mask1))
        variables = model.init(jax.random.PRNGKey(0), *args)

        def loss(p):
            g, _ = model.apply({"params": p}, *args)
            return jnp.sum(g ** 2)

        grads = jax.grad(loss)(variables["params"])
        assert all(
            np.all(np.isfinite(np.asarray(x)))
            for x in jax.tree_util.tree_leaves(grads)
        ), agg
