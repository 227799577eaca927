"""Co-attention family tests: shapes/grads for all variants, pad-size
invariance under masking, and numpy-transcription parity for the
para/pool/vqa mechanisms (reference equations cited in the module)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gcnbmp_tpu.models.coattention import (
    COATTENTION_REGISTRY,
    build_coattention,
)

B, N1, N2, H, D = 3, 6, 9, 8, 12


def _inputs(seed=0, n1=N1, n2=N2):
    rng = np.random.default_rng(seed)
    atoms1 = rng.normal(size=(B, n1, H)).astype(np.float32)
    atoms2 = rng.normal(size=(B, n2, H)).astype(np.float32)
    g1 = rng.normal(size=(B, D)).astype(np.float32)
    g2 = rng.normal(size=(B, D)).astype(np.float32)
    mask1 = np.zeros((B, n1), np.float32)
    mask2 = np.zeros((B, n2), np.float32)
    mask1[:, :4] = 1
    mask2[:, :5] = 1
    return atoms1, g1, atoms2, g2, mask1, mask2


@pytest.mark.parametrize("name", sorted(COATTENTION_REGISTRY))
def test_shapes_and_finite_grads(name):
    atoms1, g1, atoms2, g2, mask1, mask2 = _inputs()
    mod = build_coattention(name, hidden_dim=H, out_dim=D)
    variables = mod.init(jax.random.PRNGKey(0), atoms1, g1, atoms2, g2, mask1, mask2)
    c1, c2 = mod.apply(variables, atoms1, g1, atoms2, g2, mask1, mask2)
    expected = 3 * D if name == "bimpm" else D
    assert c1.shape == (B, expected) and c2.shape == (B, expected)

    def loss(p):
        a, b = mod.apply({"params": p}, atoms1, g1, atoms2, g2, mask1, mask2)
        return jnp.sum(a ** 2) + jnp.sum(b ** 2)

    grads = jax.grad(loss)(variables["params"])
    assert all(
        np.all(np.isfinite(np.asarray(g))) for g in jax.tree_util.tree_leaves(grads)
    ), name


@pytest.mark.parametrize(
    "name", [n for n in sorted(COATTENTION_REGISTRY) if n != "lt"]
)
def test_pad_invariance_with_mask(name):
    """Masked co-attention must not depend on the number of padded rows.
    ('lt' is position-indexed by design — its projections are sized by the
    padded length, so it is excluded.)"""
    atoms1, g1, atoms2, g2, mask1, mask2 = _inputs()
    mod = build_coattention(name, hidden_dim=H, out_dim=D)
    variables = mod.init(jax.random.PRNGKey(0), atoms1, g1, atoms2, g2, mask1, mask2)
    out_a = mod.apply(variables, atoms1, g1, atoms2, g2, mask1, mask2)
    # grow padding with garbage rows
    pad1 = np.concatenate([atoms1, np.full((B, 3, H), 7.7, np.float32)], axis=1)
    pad2 = np.concatenate([atoms2, np.full((B, 2, H), -4.2, np.float32)], axis=1)
    m1 = np.concatenate([mask1, np.zeros((B, 3), np.float32)], axis=1)
    m2 = np.concatenate([mask2, np.zeros((B, 2), np.float32)], axis=1)
    out_b = mod.apply(variables, pad1, g1, pad2, g2, m1, m2)
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def _np_softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_para_parity():
    """ParallelCoattention vs numpy transcription of
    parallel_coattention.py:34-84 (head=1, tanh, no softmax)."""
    atoms1, g1, atoms2, g2, _, _ = _inputs()
    mod = build_coattention("para", hidden_dim=H, out_dim=D)
    variables = mod.init(jax.random.PRNGKey(0), atoms1, g1, atoms2, g2)
    c1, c2 = mod.apply(variables, atoms1, g1, atoms2, g2)
    p = jax.device_get(variables["params"])
    w, v1, v2, b = p["W_0"], p["V1_0"], p["V2_0"], p["b_0"]
    jk, jb = p["j"]["dense"]["kernel"], p["j"]["dense"]["bias"]

    def attend(query, key):
        e = np.einsum("bnh,hdk,bd->bnk", key, w, query) + key @ v1 \
            + (query @ v2)[:, None, :] + b
        return np.tanh(e)

    j1 = atoms1 @ jk + jb
    j2 = atoms2 @ jk + jb
    ref1 = (attend(g2, atoms1) * j1).sum(axis=1)
    ref2 = (attend(g1, atoms2) * j2).sum(axis=1)
    np.testing.assert_allclose(np.asarray(c1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), ref2, rtol=1e-4, atol=1e-5)


def test_vqa_parity():
    """VQA affinity scheme vs numpy transcription of
    vqa_parallel_coattention.py:42-103 (unmasked)."""
    atoms1, g1, atoms2, g2, _, _ = _inputs()
    mod = build_coattention("vqa", hidden_dim=H, out_dim=D)
    variables = mod.init(jax.random.PRNGKey(0), atoms1, g1, atoms2, g2)
    c1, c2 = mod.apply(variables, atoms1, g1, atoms2, g2)
    p = jax.device_get(variables["params"])
    e = p["energy"]
    # C[b, i(mol2), j(mol1)] = tanh(atoms1_j W atoms2_i + V1 atoms1_j + V2 atoms2_i + b)
    c = np.tanh(
        np.einsum("bkh,hg,bqg->bqk", atoms1, e["W"], atoms2)
        + np.swapaxes(atoms1 @ e["V1"], 1, 2)
        + atoms2 @ e["V2"]
        + e["b"]
    )
    l2 = _np_softmax(c, axis=1)
    l1 = _np_softmax(np.swapaxes(c, 1, 2), axis=1)
    lt1 = atoms1 @ p["lt1"]["dense"]["kernel"]
    lt2 = atoms2 @ p["lt2"]["dense"]["kernel"]
    h1 = np.tanh(lt1 + np.einsum("bij,bjh->bih", l1, lt2))
    h2 = np.tanh(lt2 + np.einsum("bij,bjh->bih", l2, lt1))
    a1 = _np_softmax(h1 @ p["attn1"]["dense"]["kernel"], axis=1)
    a2 = _np_softmax(h2 @ p["attn2"]["dense"]["kernel"], axis=1)
    j1 = atoms1 @ p["j"]["dense"]["kernel"] + p["j"]["dense"]["bias"]
    j2 = atoms2 @ p["j"]["dense"]["kernel"] + p["j"]["dense"]["bias"]
    ref1 = (a1 * j1).sum(axis=1)
    ref2 = (a2 * j2).sum(axis=1)
    np.testing.assert_allclose(np.asarray(c1), ref1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), ref2, rtol=1e-4, atol=1e-5)


def test_pool_parity():
    """Pooling variant vs transcription of PoolingFineCoattention.py:32-57."""
    atoms1, g1, atoms2, g2, _, _ = _inputs()
    mod = build_coattention("pool", hidden_dim=H, out_dim=D)
    variables = mod.init(jax.random.PRNGKey(0), atoms1, g1, atoms2, g2)
    c1, c2 = mod.apply(variables, atoms1, g1, atoms2, g2)
    p = jax.device_get(variables["params"])
    e = p["energy"]
    c = np.tanh(
        np.einsum("bkh,hg,bqg->bqk", atoms1, e["W"], atoms2)
        + np.swapaxes(atoms1 @ e["V1"], 1, 2)
        + atoms2 @ e["V2"]
        + e["b"]
    )  # (B, N2, N1)
    a1 = _np_softmax(c.mean(axis=1), axis=1)[..., None]
    a2 = _np_softmax(c.mean(axis=2), axis=1)[..., None]
    j1 = atoms1 @ p["j"]["dense"]["kernel"] + p["j"]["dense"]["bias"]
    j2 = atoms2 @ p["j"]["dense"]["kernel"] + p["j"]["dense"]["bias"]
    np.testing.assert_allclose(np.asarray(c1), (a1 * j1).sum(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c2), (a2 * j2).sum(1), rtol=1e-4, atol=1e-5)


def test_predictor_with_coattention_end_to_end():
    from gcnbmp_tpu.chem import GGNNFeaturizer, mol_from_smiles
    from gcnbmp_tpu.data.dataset import PairDataset, make_batch
    from gcnbmp_tpu.models import set_up_predictor

    f = GGNNFeaturizer()
    ds = PairDataset()
    for s1, s2, y in [("CCO", "c1ccccc1", 1), ("CC", "C=O", 0)]:
        ds.append(f(mol_from_smiles(s1)), f(mol_from_smiles(s2)), np.float32(y))
    batch = make_batch(ds, [0, 1])
    for attn in ["para", "nie", "bimpm"]:
        pred = set_up_predictor(
            method="ggnn", fp_hidden_dim=8, fp_out_dim=8, conv_layers=2,
            sim_method="hole", attn_model=attn,
        )
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
        assert out.shape == (2, 1) and np.all(np.isfinite(np.asarray(out))), attn
