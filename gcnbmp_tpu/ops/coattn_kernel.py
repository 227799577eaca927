"""Fused pairwise bilinear affinity kernel (SDDMM-style).

The co-attention family's shared hot op (SURVEY §7.2e): the affinity
matrix E[b, q, k] = act(key_k^T W query_q + V1 key_k + V2 query_q + c)
over every atom pair of a molecule pair.  The reference materializes
(mb*N1*N2, hidden) tiles for it (nie_coattention.py:372-396); the XLA
path here (models/coattention.PairBilinear) is already an einsum; this
Pallas kernel additionally fuses the three contributions and the
activation into one VMEM-resident pass per pair — no (B, N, H) @ W
intermediate ever hits HBM.

Forward-only by design: the co-attention affinity is small enough that
training uses the XLA path (autodiff); the fused kernel serves the
inference/serving path where the affinity dominates co-attention
models' step time at large pair batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affinity_kernel(activation, key_ref, query_ref, w_ref, v1_ref, v2_ref,
                     c_ref, out_ref):
    hi = jax.lax.Precision.HIGHEST  # f32 MXU passes: the affinity feeds a
    # softmax, where bf16 error near decision boundaries is visible
    key = key_ref[0]      # (Nk, H)
    query = query_ref[0]  # (Nq, H)
    kw = jnp.dot(key, w_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)  # (Nk, G)
    e = jnp.dot(query, kw.T, preferred_element_type=jnp.float32, precision=hi)
    e = e + jnp.dot(key, v1_ref[:], preferred_element_type=jnp.float32,
                    precision=hi).T
    e = e + jnp.dot(query, v2_ref[:], preferred_element_type=jnp.float32,
                    precision=hi)
    e = e + c_ref[0, 0]
    if activation == "tanh":
        e = jnp.tanh(e)
    out_ref[0] = e


@functools.partial(jax.jit, static_argnames=("activation",))
def pair_bilinear_affinity(key, query, w, v1, v2, c, activation="tanh"):
    """E[b, q, k] = act(key_bk^T W query_bq + V1 key_bk + V2 query_bq + c).

    Args:
        key: (B, Nk, H); query: (B, Nq, G); w: (H, G); v1: (H, 1);
        v2: (G, 1); c: scalar bias.
    Returns: (B, Nq, Nk) — the orientation of PairBilinear.
    """
    b, nk, h = key.shape
    nq, g = query.shape[1], query.shape[2]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_affinity_kernel, activation),
        out_shape=jax.ShapeDtypeStruct((b, nq, nk), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, nk, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, g), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((h, g)), full((h, 1)), full((g, 1)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nq, nk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(key, query, w, v1, v2, jnp.reshape(c, (1, 1)).astype(jnp.float32))


def pair_bilinear_affinity_xla(key, query, w, v1, v2, c, activation="tanh"):
    """XLA reference (identical math to models/coattention.PairBilinear)."""
    e = jnp.einsum("bkh,hg,bqg->bqk", key, w, query)
    e = e + jnp.swapaxes(key @ v1, -1, -2)
    e = e + (query @ v2)
    e = e + c
    return jnp.tanh(e) if activation == "tanh" else e
