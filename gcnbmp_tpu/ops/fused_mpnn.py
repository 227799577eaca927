"""Fused multi-layer MPNN (EdgeNet message + GRU) Pallas kernel.

Round 5: after the dotgen EdgeNet (DESIGN §9e) the MPNN step's dominant
cost is still the per-layer adjacency re-read — each of the 4 layers
contracts the (P, 4, T, T) adjacency twice (out- and in-direction), in
forward AND backward.  This kernel is the fused_ggnn.py pattern applied
to MPNN's weight-TIED production config (quality row
`ref_scale_mpnn_*`): all layers for a block of K tiles run in one grid
step with the flat adjacency AND the per-tile molecule-equality matrix
resident in VMEM; the backward recomputes activations checkpoint-style
and accumulates weight grads across the sequential grid.

Semantics per layer (models/packed.PackedEdgeNet + ChainerGRUCell,
reference models/update/mpnn_update.py:36-101):

    hm_e   = h @ We'            We' = (M_e - M0)^T   (4 per-type mats)
    out_i  = sum_{e,j} adj[e,i,j] hm_e[j]            (flat (T,4T) matmul)
    in_j   = sum_{e,i} adj[e,i,j] hm_e[i]            (4 transposed (T,T))
    bg     = (Mmol @ h) @ M0^T                       (molecule background;
             Mmol[i,j] = 1 iff mol(i)==mol(j), both real — symmetric,
             block-diagonal per tile since molecules never span tiles)
    x      = [out + bg, in + bg]
    h'     = ChainerGRU(state, x)      state = 0 at layer 0, else h

The EdgeNet matrices (M0, M_e) are FUNCTIONS of the nn1/nn2 params;
they are computed outside in XLA (5 tiny matmuls) and passed in — the
custom VJP returns their cotangents and XLA's autodiff carries them
back to nn1/nn2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gcnbmp_tpu.ops.fused_ggnn import NUM_EDGE_TYPE, TILE, _mm, _pad_tiles

# measured optimum on the v5e (round-5 probe): fwd 8 / bwd 4 gives
# 11.28 ms; bwd 8 -> 11.99, bwd 2 -> 12.26, fwd 16 -> remote-compile
# fail (program size)
DEFAULT_BLOCK_TILES = 8
DEFAULT_BWD_BLOCK_TILES = 4


def _gru_fwd(x, state, wz, uz, bz, wr, ur, br, wn, un, bn):
    z = jax.nn.sigmoid(_mm(x, wz) + _mm(state, uz) + bz)
    r = jax.nn.sigmoid(_mm(x, wr) + _mm(state, ur) + br)
    n = jnp.tanh(_mm(x, wn) + _mm(r * state, un) + bn)
    return z * n + (1.0 - z) * state, (z, r, n)


def _mpnn_layer_fwd(k_tiles, h, state, adj, molmat, w_types, m0t, weights):
    """One MPNN layer on a (K*T, H) block; adj (K, T, 4T) flat,
    molmat (K, T, T); w_types (4, ch, ch), m0t (ch, ch) and GRU
    weights are THIS layer's (callers index the per-layer stacks)."""
    t = TILE
    ch = h.shape[-1]
    hm = [_mm(h, w_types[e]) for e in range(NUM_EDGE_TYPE)]  # 4 x (KT, ch)
    out_parts, in_parts, bg_parts = [], [], []
    for k in range(k_tiles):
        sl = slice(k * t, (k + 1) * t)
        hw_stack = jnp.concatenate([hm[e][sl] for e in range(NUM_EDGE_TYPE)],
                                   axis=0)                     # (4T, ch)
        out_parts.append(_mm(adj[k], hw_stack))                # (T, ch)
        in_k = _mm(adj[k][:, 0:t].T, hm[0][sl])
        for e in range(1, NUM_EDGE_TYPE):
            in_k = in_k + _mm(adj[k][:, e * t:(e + 1) * t].T, hm[e][sl])
        in_parts.append(in_k)
        bg_parts.append(_mm(molmat[k], h[sl]))                 # (T, ch)
    out = jnp.concatenate(out_parts, axis=0)
    inn = jnp.concatenate(in_parts, axis=0)
    bg = _mm(jnp.concatenate(bg_parts, axis=0), m0t)           # (KT, ch)
    x = jnp.concatenate([out + bg, inn + bg], axis=-1)
    h_new, gates = _gru_fwd(x, state, *weights)
    return h_new, (hm, out, inn, bg, x, gates)


def _fwd_kernel(n_layers, carry_state, k_tiles, h0_ref, adj_ref, mol_ref,
                wt_ref, m0t_ref,
                wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
                wn_ref, un_ref, bn_ref, out_ref):
    kt = k_tiles * TILE
    h = h0_ref[...].reshape(kt, h0_ref.shape[-1])
    state = jnp.zeros_like(h)
    adj = adj_ref[...].astype(jnp.float32)
    molmat = mol_ref[...].astype(jnp.float32)
    for l in range(n_layers):
        w_types = [wt_ref[l, e] for e in range(NUM_EDGE_TYPE)]
        weights = (wz_ref[l], uz_ref[l], bz_ref[l], wr_ref[l], ur_ref[l],
                   br_ref[l], wn_ref[l], un_ref[l], bn_ref[l])
        h, _ = _mpnn_layer_fwd(k_tiles, h, state, adj, molmat,
                               w_types, m0t_ref[l], weights)
        # tied weights carry ONE GRU state across layers (state = prev
        # h); untied layers each own a fresh zero state (the per-layer
        # gru_states list in PackedMPNN / the reference)
        state = h if carry_state else state
    out_ref[...] = h.reshape(out_ref.shape)


def _bwd_kernel(n_layers, carry_state, k_tiles, h0_ref, adj_ref, mol_ref,
                wt_ref, m0t_ref,
                wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
                wn_ref, un_ref, bn_ref, dh_final_ref,
                dh0_ref, dwt_ref, dm0t_ref,
                dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
                dwn_ref, dun_ref, dbn_ref,
                h_scratch):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        for ref in (dwt_ref, dm0t_ref, dwz_ref, duz_ref, dbz_ref,
                    dwr_ref, dur_ref, dbr_ref, dwn_ref, dun_ref, dbn_ref):
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    t = TILE
    kt = k_tiles * t
    ch = h0_ref.shape[-1]
    adj = adj_ref[...].astype(jnp.float32)
    molmat = mol_ref[...].astype(jnp.float32)

    def layer_weights(l):
        w_types = [wt_ref[l, e] for e in range(NUM_EDGE_TYPE)]
        gw = (wz_ref[l], uz_ref[l], bz_ref[l], wr_ref[l], ur_ref[l],
              br_ref[l], wn_ref[l], un_ref[l], bn_ref[l])
        return w_types, m0t_ref[l], gw

    # recompute forward, stashing each layer's input
    h = h0_ref[...].reshape(kt, ch)
    state = jnp.zeros_like(h)
    for l in range(n_layers):
        h_scratch[l] = h
        w_types, m0t, weights = layer_weights(l)
        h, _ = _mpnn_layer_fwd(k_tiles, h, state, adj, molmat,
                               w_types, m0t, weights)
        state = h if carry_state else state

    dh = dh_final_ref[...].reshape(kt, ch)
    # per-layer grads are each written exactly once in the reverse
    # loop — collect in Python lists and stack (in-kernel .at[].add
    # would lower to an unsupported scatter-add)
    L = n_layers
    dwt_l = [None] * L
    dm0t_l = [None] * L
    dwz_l = [None] * L
    duz_l = [None] * L
    dbz_l = [None] * L
    dwr_l = [None] * L
    dur_l = [None] * L
    dbr_l = [None] * L
    dwn_l = [None] * L
    dun_l = [None] * L
    dbn_l = [None] * L
    for l in range(n_layers - 1, -1, -1):
        h_in = h_scratch[l]
        state = (h_scratch[l] if (carry_state and l > 0)
                 else jnp.zeros_like(h_in))
        w_types, m0t, weights = layer_weights(l)
        (wz, uz, bz, wr, ur, br, wn, un, bn) = weights
        _, (hm, out, inn, bg, x, (z, r, n)) = _mpnn_layer_fwd(
            k_tiles, h_in, state, adj, molmat, w_types, m0t, weights)
        # GRU backward (fused_ggnn math, x = 2ch-wide messages)
        dz = dh * (n - state)
        dn = dh * z
        dstate = dh * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dz_pre = dz * z * (1.0 - z)
        drs = _mm(dn_pre, un.T)
        dr = drs * state
        dstate = dstate + drs * r
        dr_pre = dr * r * (1.0 - r)
        dx = (_mm(dz_pre, wz.T) + _mm(dr_pre, wr.T) + _mm(dn_pre, wn.T))
        dstate = dstate + _mm(dz_pre, uz.T) + _mm(dr_pre, ur.T)
        dwz_l[l] = _mm(x.T, dz_pre)
        dwr_l[l] = _mm(x.T, dr_pre)
        dwn_l[l] = _mm(x.T, dn_pre)
        duz_l[l] = _mm(state.T, dz_pre)
        dur_l[l] = _mm(state.T, dr_pre)
        dun_l[l] = _mm((r * state).T, dn_pre)
        dbz_l[l] = jnp.sum(dz_pre, axis=0, keepdims=True)
        dbr_l[l] = jnp.sum(dr_pre, axis=0, keepdims=True)
        dbn_l[l] = jnp.sum(dn_pre, axis=0, keepdims=True)

        dout = dx[:, :ch]
        din = dx[:, ch:]
        # background: bg = (Mmol @ h) @ m0t; d flows from BOTH halves
        dbg = dout + din
        mh_parts = [_mm(molmat[k], h_in[k * t:(k + 1) * t])
                    for k in range(k_tiles)]
        mh = jnp.concatenate(mh_parts, axis=0)                 # (KT, ch)
        dm0t_l[l] = _mm(mh.T, dbg)
        dmh = _mm(dbg, m0t.T)
        dh_in = jnp.concatenate(
            [_mm(molmat[k], dmh[k * t:(k + 1) * t])  # Mmol symmetric
             for k in range(k_tiles)], axis=0)
        # message paths
        dhm_parts = [[] for _ in range(NUM_EDGE_TYPE)]
        for k in range(k_tiles):
            sl = slice(k * t, (k + 1) * t)
            # out_k = adj[k] @ hw_stack -> dhw_stack = adj[k].T @ dout_k
            dhw_stack = _mm(adj[k].T, dout[sl])                # (4T, ch)
            for e in range(NUM_EDGE_TYPE):
                # in_e = B_e.T @ hm_e -> dhm_e += B_e @ din_k
                dhm_parts[e].append(
                    dhw_stack[e * t:(e + 1) * t]
                    + _mm(adj[k][:, e * t:(e + 1) * t], din[sl]))
        dhm = [jnp.concatenate(parts, axis=0) for parts in dhm_parts]
        dwt_l[l] = jnp.stack(
            [_mm(h_in.T, dhm[e]) for e in range(NUM_EDGE_TYPE)])
        for e in range(NUM_EDGE_TYPE):
            dh_in = dh_in + _mm(dhm[e], w_types[e].T)
        dh = dh_in + (dstate if (carry_state and l > 0) else 0.0)

    dh0_ref[...] = dh.reshape(dh0_ref.shape)
    dwt_ref[...] += jnp.stack(dwt_l)
    dm0t_ref[...] += jnp.stack(dm0t_l)
    dwz_ref[...] += jnp.stack(dwz_l)
    duz_ref[...] += jnp.stack(duz_l)
    dbz_ref[...] += jnp.stack(dbz_l)
    dwr_ref[...] += jnp.stack(dwr_l)
    dur_ref[...] += jnp.stack(dur_l)
    dbr_ref[...] += jnp.stack(dbr_l)
    dwn_ref[...] += jnp.stack(dwn_l)
    dun_ref[...] += jnp.stack(dun_l)
    dbn_ref[...] += jnp.stack(dbn_l)


def _specs(k, t, ch, n_layers, memory=pltpu.VMEM, dh=False):
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=memory)
    specs = [
        pl.BlockSpec((k, t, ch), lambda i: (i, 0, 0), memory_space=memory),
        pl.BlockSpec((k, t, NUM_EDGE_TYPE * t), lambda i: (i, 0, 0),
                     memory_space=memory),
        pl.BlockSpec((k, t, t), lambda i: (i, 0, 0), memory_space=memory),
        full((n_layers, NUM_EDGE_TYPE, ch, ch)), full((n_layers, ch, ch)),
        full((n_layers, 2 * ch, ch)), full((n_layers, ch, ch)),
        full((n_layers, 1, ch)),
        full((n_layers, 2 * ch, ch)), full((n_layers, ch, ch)),
        full((n_layers, 1, ch)),
        full((n_layers, 2 * ch, ch)), full((n_layers, ch, ch)),
        full((n_layers, 1, ch)),
    ]
    if dh:
        specs.append(pl.BlockSpec((k, t, ch), lambda i: (i, 0, 0),
                                  memory_space=memory))
    return specs


def _weight_args(w_types, m0t, gru):
    L = w_types.shape[0]
    return (w_types, m0t,
            gru["wz"], gru["uz"], gru["bz"].reshape(L, 1, -1),
            gru["wr"], gru["ur"], gru["br"].reshape(L, 1, -1),
            gru["wn"], gru["un"], gru["bn"].reshape(L, 1, -1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_mpnn(n_layers: int, carry_state: bool, h0, adj_flat, molmat,
               w_types, m0t, gru):
    """Run n_layers of weight-tied EdgeNet-MPNN over packed tiles.

    Args:
        h0: (P, T, C) initial node states.
        adj_flat: (P, T, 4T) flat adjacency (fused_ggnn AGG_FLAT
            layout, adj_from_coo_flat / _prep_adj) — bf16 ok.
        molmat: (P, T, T) molecule-equality matrix (1 where two REAL
            slots share a molecule; block-diagonal, symmetric) — bf16 ok.
        w_types: (L, 4, C, C) per-LAYER per-edge-type mats, already
            (M_e - M0)^T (replicate the one set for tied weights —
            the outside stack's VJP sums the per-layer grads back).
        m0t: (L, C, C) = per-layer M0^T.
        gru: dict of per-layer stacks wz/wr/wn (L, 2C, C),
            uz/ur/un (L, C, C), bz/br/bn (L, C).
    Returns (P, T, C) final node states.
    """
    out, _ = _fused_mpnn_fwd(n_layers, carry_state, h0, adj_flat,
                             molmat, w_types, m0t, gru)
    return out


def _fused_mpnn_fwd(n_layers, carry_state, h0, adj_flat, molmat,
                    w_types, m0t, gru, block_tiles=None):
    p, t, ch = h0.shape
    k = min(block_tiles or DEFAULT_BLOCK_TILES, p)
    args = _weight_args(w_types, m0t, gru)
    h0p = _pad_tiles(h0, k)
    adjp = _pad_tiles(adj_flat, k)
    molp = _pad_tiles(molmat, k)
    pp = h0p.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, carry_state, k),
        out_shape=jax.ShapeDtypeStruct((pp, t, ch), jnp.float32),
        grid=(pp // k,),
        in_specs=_specs(k, t, ch, n_layers),
        out_specs=pl.BlockSpec((k, t, ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(h0p, adjp, molp, *args)
    return out[:p], (h0, adj_flat, molmat, w_types, m0t, gru)


def _fused_mpnn_bwd(n_layers, carry_state, residuals, dh_final,
                    block_tiles=None):
    h0, adj_flat, molmat, w_types, m0t, gru = residuals
    p, t, ch = h0.shape
    k = min(block_tiles or DEFAULT_BWD_BLOCK_TILES, p)
    args = _weight_args(w_types, m0t, gru)
    h0p = _pad_tiles(h0, k)
    adjp = _pad_tiles(adj_flat, k)
    molp = _pad_tiles(molmat, k)
    dhp = _pad_tiles(dh_final, k)
    pp = h0p.shape[0]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    L = n_layers
    out_shapes = (
        jax.ShapeDtypeStruct((pp, t, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, NUM_EDGE_TYPE, ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, 2 * ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, 1, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, 2 * ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, 1, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, 2 * ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, ch, ch), jnp.float32),
        jax.ShapeDtypeStruct((L, 1, ch), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((k, t, ch), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        full((L, NUM_EDGE_TYPE, ch, ch)), full((L, ch, ch)),
        full((L, 2 * ch, ch)), full((L, ch, ch)), full((L, 1, ch)),
        full((L, 2 * ch, ch)), full((L, ch, ch)), full((L, 1, ch)),
        full((L, 2 * ch, ch)), full((L, ch, ch)), full((L, 1, ch)),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers, carry_state, k),
        out_shape=out_shapes,
        grid=(pp // k,),
        in_specs=_specs(k, t, ch, n_layers, dh=True),
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_layers, k * t, ch), jnp.float32)],
    )(h0p, adjp, molp, *args, dhp)
    (dh0, dwt, dm0t, dwz, duz, dbz, dwr, dur, dbr, dwn, dun, dbn) = outs
    dgru = {
        "wz": dwz, "uz": duz, "bz": dbz.reshape(n_layers, -1),
        "wr": dwr, "ur": dur, "br": dbr.reshape(n_layers, -1),
        "wn": dwn, "un": dun, "bn": dbn.reshape(n_layers, -1),
    }
    return (dh0[:p], None, None, dwt, dm0t, dgru)


fused_mpnn.defvjp(_fused_mpnn_fwd, _fused_mpnn_bwd)


def build_molmat(mol_id, node_mask, dtype=jnp.float32):
    """(P, T, T) molecule-equality matrix from the packed mol ids
    (molecules never span tiles, so per-tile equality is exact):
    molmat[p, i, j] = 1 iff mol(p,i) == mol(p,j) and both slots real."""
    eq = (mol_id[:, :, None] == mol_id[:, None, :])
    real = (node_mask[:, :, None] > 0) & (node_mask[:, None, :] > 0)
    return (eq & real).astype(dtype)
