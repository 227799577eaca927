"""Fused Set2Set Pallas kernel (round 5, VERDICT r4 #3).

The dense Set2Set (models/packed.PackedSet2Set, reference semantics
models/readout/set2set.py:14-57) runs S processing steps of
LSTM -> masked softmax attention -> weighted sum over a
(num_mols, n_max, C) atom table.  In XLA each step is ~10 small kernels
(gate matmuls, einsums, softmax chain) and the backward re-runs the
chain in reverse — at B=2048 that is ~60+ dispatches of
launch-latency-bound ops on tiny tensors (DESIGN.md §9c: Set2Set still
carries most of MPNN's residual over the GGNN base).

This kernel runs ALL S steps for a block of molecules with the atom
table resident in VMEM: one kernel forward, one kernel backward
(checkpoint-style recompute with per-step VMEM stashes + closed-form
LSTM/softmax adjoints).  Weight grads accumulate across grid steps via
the revisited-output-block pattern (same as ops/fused_ggnn.py).

LSTM semantics match flax.linen.OptimizedLSTMCell exactly (gate order
i|f|g|o, sigmoid/sigmoid/tanh/sigmoid, input kernels bias-free, hidden
kernels biased); the softmax matches the dense path's
``softmax(where(mask, e, -1e9)) * mask`` form bit-for-bit in f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
# molecule-block size: 512 compiles the forward but crashes the remote
# compiler on the (heavier) backward; 256 compiles both (probed on
# hardware, round 5)
DEFAULT_BLOCK_M = 256


def _step_fwd(atoms, amask, wx, wh, b, c, hh, q_star):
    """One Set2Set processing step; returns new (c, q, p, q_star)."""
    ch = wh.shape[0]
    y = (jnp.dot(q_star, wx, preferred_element_type=jnp.float32)
         + jnp.dot(hh, wh, preferred_element_type=jnp.float32) + b)
    i = jax.nn.sigmoid(y[:, :ch])
    f = jax.nn.sigmoid(y[:, ch:2 * ch])
    g = jnp.tanh(y[:, 2 * ch:3 * ch])
    o = jax.nn.sigmoid(y[:, 3 * ch:])
    c_new = f * c + i * g
    q = o * jnp.tanh(c_new)
    e = jnp.sum(atoms * q[:, None, :], axis=-1)
    em = jnp.where(amask > 0, e, NEG)
    z = jnp.exp(em - jnp.max(em, axis=1, keepdims=True))
    p = z / jnp.sum(z, axis=1, keepdims=True)
    r = jnp.sum((p * amask)[:, :, None] * atoms, axis=1)
    return c_new, q, (i, f, g, o), p, jnp.concatenate([q, r], axis=-1)


def _fwd_kernel(steps, atoms_ref, amask_ref, wx_ref, wh_ref, b_ref, out_ref):
    atoms = atoms_ref[...].astype(jnp.float32)
    amask = amask_ref[...].astype(jnp.float32)
    wx, wh, b = wx_ref[:], wh_ref[:], b_ref[:]
    mb = atoms.shape[0]
    ch = wh.shape[0]
    c = jnp.zeros((mb, ch), jnp.float32)
    hh = jnp.zeros((mb, ch), jnp.float32)
    q_star = jnp.zeros((mb, 2 * ch), jnp.float32)
    for _ in range(steps):
        c, q, _, _, q_star = _step_fwd(atoms, amask, wx, wh, b, c, hh, q_star)
        hh = q
    out_ref[...] = q_star


def _bwd_kernel(steps, atoms_ref, amask_ref, wx_ref, wh_ref, b_ref,
                dgq_ref, dgr_ref,
                dwx_ref, dwh_ref, db_ref, pa_ref, de_ref, dr_ref, q_ref):
    """Reverse pass WITHOUT the datoms outer products.

    Mosaic on this backend crashes on two constructs the naive adjoint
    needs (probed on hardware, round 5): (a) the keepdims-rebroadcast
    softmax jacobian p*(dp - sum(p*dp, keepdims)) — written in split
    form instead; (b) MATERIALIZING a lane-broadcast product
    x[:, :, None] * y[:, None, :] (fine when fused into a reduction,
    crash when stored).  So the kernel emits the per-step attention
    vectors (pa = p*amask, de, dr, q) and the XLA epilogue in
    _fused_set2set_bwd assembles datoms = sum_s pa⊗dr + de⊗q — a few
    fused elementwise ops there."""
    gid = pl.program_id(0)

    @pl.when(gid == 0)
    def _init():
        dwx_ref[...] = jnp.zeros(dwx_ref.shape, jnp.float32)
        dwh_ref[...] = jnp.zeros(dwh_ref.shape, jnp.float32)
        db_ref[...] = jnp.zeros(db_ref.shape, jnp.float32)

    atoms = atoms_ref[...].astype(jnp.float32)
    amask = amask_ref[...].astype(jnp.float32)
    wx, wh, b = wx_ref[:], wh_ref[:], b_ref[:]
    mb = atoms.shape[0]
    ch = wh.shape[0]

    # recompute forward, keeping per-step values live (S is small: the
    # unrolled chain stays in VMEM/registers)
    c = jnp.zeros((mb, ch), jnp.float32)
    hh = jnp.zeros((mb, ch), jnp.float32)
    q_star = jnp.zeros((mb, 2 * ch), jnp.float32)
    c_all = [c]
    qs_all = [q_star]
    gates_all = []
    p_all = []
    q_all = []
    for _ in range(steps):
        c, q, gates, p, q_star = _step_fwd(
            atoms, amask, wx, wh, b, c, hh, q_star)
        hh = q
        c_all.append(c)
        qs_all.append(q_star)
        gates_all.append(gates)
        p_all.append(p)
        q_all.append(q)

    dq = dgq_ref[...].astype(jnp.float32)
    dr = dgr_ref[...].astype(jnp.float32)
    dc = jnp.zeros((mb, ch), jnp.float32)
    dhh = jnp.zeros((mb, ch), jnp.float32)
    dwx = jnp.zeros(dwx_ref.shape, jnp.float32)
    dwh = jnp.zeros(dwh_ref.shape, jnp.float32)
    db = jnp.zeros(db_ref.shape, jnp.float32)
    for s in range(steps - 1, -1, -1):
        i, f, g, o = gates_all[s]
        p = p_all[s]
        q = q_all[s]
        c_new = c_all[s + 1]
        c_prev = c_all[s]
        qs_in = qs_all[s]
        hh_prev = qs_in[:, :ch]  # the LSTM hidden IS the previous q

        # r = sum_n (p*amask)_n atoms_n
        da = jnp.sum(atoms * dr[:, None, :], axis=-1)       # (mb, N)
        dp = da * amask
        pdp = p * dp
        ssum = jnp.sum(pdp, axis=1)                          # no keepdims
        dem = pdp - p * ssum[:, None]
        de = jnp.where(amask > 0, dem, 0.0)
        dq = dq + jnp.sum(de[:, :, None] * atoms, axis=1)
        # stash the epilogue's outer-product factors for this step
        pa_ref[s] = p * amask
        de_ref[s] = de
        dr_ref[s] = dr
        q_ref[s] = q
        # q = o * tanh(c_new); q also fed the NEXT step's hidden
        dq_t = dq + dhh
        tc = jnp.tanh(c_new)
        do = dq_t * tc
        dc_new = dq_t * o * (1.0 - tc * tc) + dc
        df = dc_new * c_prev
        dc = dc_new * f
        di = dc_new * g
        dgg = dc_new * i
        dy = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dgg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)                                          # (mb, 4C)
        dwx = dwx + jnp.dot(qs_in.T, dy,
                            preferred_element_type=jnp.float32)
        dwh = dwh + jnp.dot(hh_prev.T, dy,
                            preferred_element_type=jnp.float32)
        db = db + jnp.sum(dy, axis=0, keepdims=True)
        dq_star = jnp.dot(dy, wx.T, preferred_element_type=jnp.float32)
        # lane-slicing a matmul OUTPUT is Mosaic-safe (fused_ggnn
        # precedent) — the INPUT dg arrives pre-split instead
        dq = dq_star[:, :ch]
        dr = dq_star[:, ch:]
        dhh = jnp.dot(dy, wh.T, preferred_element_type=jnp.float32)

    dwx_ref[...] += dwx
    dwh_ref[...] += dwh
    db_ref[...] += db


def _pad_m(x, block):
    m = x.shape[0]
    rem = (-m) % block
    if rem:
        x = jnp.pad(x, [(0, rem)] + [(0, 0)] * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_set2set(steps: int, atoms, amask, wx, wh, b):
    """All ``steps`` Set2Set processing steps in one Pallas kernel.

    Args:
        atoms: (M, N, C) masked atom table (pad entries zero).
        amask: (M, N) f32 atom mask.
        wx: (2C, 4C) input kernels, gate order i|f|g|o
            (flax OptimizedLSTMCell ``i{c}`` kernels concatenated).
        wh: (C, 4C) hidden kernels (``h{c}``), b: (1, 4C) hidden biases.
    Returns:
        (M, 2C) q_star — bit-compatible with PackedSet2Set's dense mode.
    """
    out, _ = _fused_set2set_fwd(steps, atoms, amask, wx, wh, b)
    return out


def _block_specs(block, n, ch):
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return [
        pl.BlockSpec((block, n, ch), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        full((2 * ch, 4 * ch)), full((ch, 4 * ch)), full((1, 4 * ch)),
    ]


def _fused_set2set_fwd(steps, atoms, amask, wx, wh, b, block_m=None):
    m, n, ch = atoms.shape
    block = min(block_m or DEFAULT_BLOCK_M, m)
    atoms_p = _pad_m(atoms.astype(jnp.float32), block)
    amask_p = _pad_m(amask.astype(jnp.float32), block)
    mp = atoms_p.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, steps),
        out_shape=jax.ShapeDtypeStruct((mp, 2 * ch), jnp.float32),
        grid=(mp // block,),
        in_specs=_block_specs(block, n, ch),
        out_specs=pl.BlockSpec((block, 2 * ch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(atoms_p, amask_p, wx, wh, b)
    return out[:m], (atoms, amask, wx, wh, b)


def _fused_set2set_bwd(steps, residuals, dg, block_m=None):
    atoms, amask, wx, wh, b = residuals
    m, n, ch = atoms.shape
    block = min(block_m or DEFAULT_BLOCK_M, m)
    atoms_p = _pad_m(atoms.astype(jnp.float32), block)
    amask_p = _pad_m(amask.astype(jnp.float32), block)
    dg_p = _pad_m(dg.astype(jnp.float32), block)
    mp = atoms_p.shape[0]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    in_specs = _block_specs(block, n, ch)
    in_specs.extend([
        pl.BlockSpec((block, ch), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block, ch), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ])
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, steps),
        out_shape=(
            jax.ShapeDtypeStruct((2 * ch, 4 * ch), jnp.float32),
            jax.ShapeDtypeStruct((ch, 4 * ch), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * ch), jnp.float32),
            jax.ShapeDtypeStruct((steps, mp, n), jnp.float32),   # pa
            jax.ShapeDtypeStruct((steps, mp, n), jnp.float32),   # de
            jax.ShapeDtypeStruct((steps, mp, ch), jnp.float32),  # dr
            jax.ShapeDtypeStruct((steps, mp, ch), jnp.float32),  # q
        ),
        grid=(mp // block,),
        in_specs=in_specs,
        out_specs=(
            full((2 * ch, 4 * ch)), full((ch, 4 * ch)), full((1, 4 * ch)),
            pl.BlockSpec((steps, block, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, block, n), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, block, ch), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((steps, block, ch), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(atoms_p, amask_p, wx, wh, b, dg_p[:, :ch], dg_p[:, ch:])
    dwx, dwh, db, pa, de, dr, q = outs
    # XLA epilogue: datoms = sum_s pa_s ⊗ dr_s + de_s ⊗ q_s (the two
    # outer products Mosaic refuses to materialize in-kernel)
    datoms = (
        jnp.einsum("smn,smc->mnc", pa[:, :m], dr[:, :m])
        + jnp.einsum("smn,smc->mnc", de[:, :m], q[:, :m])
    )
    return (datoms.astype(atoms.dtype), jnp.zeros_like(amask),
            dwx, dwh, db)


fused_set2set.defvjp(_fused_set2set_fwd, _fused_set2set_bwd)
