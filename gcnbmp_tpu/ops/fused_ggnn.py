"""Fused multi-layer GGNN Pallas kernel over packed 128-atom tiles.

The packed XLA path re-reads the (P, 4, 128, 128) adjacency from HBM for
every layer in forward AND backward (16+ passes for the 8-layer
flagship).  This kernel runs ALL layers for a block of K tiles in a
single grid step with the adjacency and per-layer hidden states resident
in VMEM:

  forward : adjacency read ONCE per tile; writes h_final only.
  backward: adjacency read once more; per-layer activations are
            recomputed in VMEM (checkpoint-style), then gradients are
            backpropagated in reverse with weight grads accumulated
            across grid steps via the sequential-grid revisited-output-
            block pattern.

K-tile blocking keeps the MXU throughput-bound instead of latency-bound:
all weight/GRU matmuls batch over K*128 rows; only the 4 edge-type
aggregation matmuls run per tile.

Semantics identical to models/ggnn.py's stable path (reference
models/ggnn.py:215-263): per layer

    hw_e = h @ W_e + b_e                      (per edge type)
    m    = sum_e A_e @ hw_e
    x    = [h, m]
    z    = sigmoid(x Wz + s Uz + bz)
    r    = sigmoid(x Wr + s Ur + br)
    n    = tanh(x Wn + (r*s) Un + bn)
    h'   = z*n + (1-z)*s        s = GRU state: 0 at layer 0, else h

Weight layout: the model's GraphLinear message kernel is (H, 4H) with
edge type as the FASTEST output axis; ``params_to_fused`` pre-splits it
into per-edge-type blocks msg_w (L, 4, H, H), msg_b (L, 4, 1, H) so the
kernel only ever touches offset-0 tiles (a Mosaic-friendliness
requirement — lane-offset slice concats fail to lower).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
NUM_EDGE_TYPE = 4
DEFAULT_BLOCK_TILES = 16
# Backward K blocking: raising K batches the GRU/message matmuls over
# more rows per grid step (fewer small dispatches), bounded by VMEM —
# the adjacency block (K x T x 4T f32, double buffered) + the per-layer
# h scratch (L x K*T x H f32) + the live intermediates of the unrolled
# reverse loop.  K=4 is the measured-safe default (round-2 sweeps found
# larger blocks OOM at some widths); override per-run with
# GCNBMP_FUSED_BWD_K — scripts/tpu_sweep.py fused64_k{4,8,16} measures
# the trade-off per width.
import os as _os

DEFAULT_BWD_BLOCK_TILES = int(_os.environ.get("GCNBMP_FUSED_BWD_K", "4"))

# Round 5 (VERDICT r4 #1): TWO-PASS backward — split the reverse pass
# into two half-depth kernels with an HBM handoff of the midpoint
# activation (the forward emits h_mid = input of layer L/2 as a second
# output; backward kernel 1 recomputes+reverses the top half from
# h_mid, kernel 2 the bottom half from h0).  Each kernel's VMEM
# scratch and unrolled reverse-instruction count HALVE, which is
# exactly what bounded the round-3/4 K>=8 remote-compile failures —
# letting the backward K block rise (fewer grid steps, wider
# matmul batching).  Costs one extra P*T*H HBM write+read (~8 MB at
# B=2048/h=32 — noise next to the 61 MB adjacency).
TWOPASS = _os.environ.get("GCNBMP_FUSED_TWOPASS") == "1"


# Merge the three x-side gate matmuls into one (KT, 2H) x (2H, 3H) pass
# and the two state-side ones into (KT, H) x (H, 2H): fewer, wider MXU
# ops (output lanes 96/64 instead of 32).  Lane-slicing matmul OUTPUTS is
# Mosaic-safe (unlike concatenating lane-offset slices).  Round-2
# measured neutral-to-slower in the single big kernel; env knob for the
# round-5 retry inside the two-pass halves (VERDICT r4 #1).
MERGE_GATES = _os.environ.get("GCNBMP_FUSED_MERGE_GATES") == "1"


# Aggregate with ONE (T, 4T) x (4T, H) matmul per tile (contraction 512)
# instead of 4 separate (T, T) x (T, H) passes: 4x fewer MXU dispatches
# for the instruction-count-dominated aggregation.  The (4T, H) stack is
# built from sublane-ALIGNED row slices (offsets multiples of T=128),
# which Mosaic lowers — unlike lane-offset slice concats.  Requires the
# adjacency pre-flattened to (K, T, 4T).
AGG_FLAT = True

# Round 4 (VERDICT r3 #5): batch the per-tile aggregation over the
# K-tile block as ONE dot_general per layer — (K, T, 4T) x (K, 4T, H)
# with K as the batch dim — instead of a Python loop issuing K separate
# matmuls.  The per-layer hw stack is built by a single (KT, H) x
# (H, 4H) matmul into the edge-major layout and a VMEM-local
# (K, T, 4, H) -> (K, 4, T, H) transpose (lane dim stays last).
# MEASURED DEAD END on the v5e (SWEEPS_r04 *_kbatch rows): Mosaic
# fails to lower the transpose+batched-dot at h=32/64 (remote-compile
# MosaicError — lane dim H < 128 forces relayouts the compiler
# rejects), and at h=128 (where it does lower) the step is SLOWER
# (15.3 vs 10.8 ms) — the per-tile loop's K independent (T, 4T)
# matmuls pipeline better than one batched op.  Kept off; A/B via
# GCNBMP_FUSED_KBATCH=1.
AGG_KBATCH = _os.environ.get("GCNBMP_FUSED_KBATCH") == "1"

# Experimental: run every kernel matmul with bf16 operands (f32
# accumulation via preferred_element_type) — the MXU's native precision.
# Env-gated for bench sweeps; gradients get bf16-operand rounding, so
# the strict VJP parity tests require the default f32.
MATMUL_BF16 = _os.environ.get("GCNBMP_FUSED_BF16") == "1"


def _mm(a, b):
    if MATMUL_BF16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _bmm(a, b, contract):
    """Batched matmul over the leading (K) dim: contract ``a`` dim
    ``contract`` with ``b`` dim 1 (the AGG_KBATCH aggregation form)."""
    if MATMUL_BF16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((contract,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _kbatch_message(k_tiles, h, adj, wmsg, bmsg):
    """AGG_KBATCH forward message: one (KT, H) x (H, 4H) edge-major
    matmul + one K-batched (K, T, 4T) x (K, 4T, H) dot_general."""
    t = TILE
    hidden = h.shape[-1]
    w_all = jnp.concatenate([wmsg[e] for e in range(NUM_EDGE_TYPE)], axis=1)
    b_all = jnp.concatenate([bmsg[e] for e in range(NUM_EDGE_TYPE)], axis=1)
    hw_all = _mm(h, w_all) + b_all                      # (KT, 4H)
    hw_stack = (
        hw_all.reshape(k_tiles, t, NUM_EDGE_TYPE, hidden)
        .transpose(0, 2, 1, 3)
        .reshape(k_tiles, NUM_EDGE_TYPE * t, hidden)
    )
    m = _bmm(adj, hw_stack, 2).reshape(k_tiles * t, hidden)
    return m


def _layer_fwd(k_tiles, h, state, adj, wmsg, bmsg,
               wz, uz, bz, wr, ur, br, wn, un, bn):
    """One GGNN layer on a (K*T, H) block.

    adj: (K, T, 4T) flattened (AGG_FLAT) or (K, 4, T, T), f32."""
    t = TILE
    if AGG_KBATCH:
        m = _kbatch_message(k_tiles, h, adj, wmsg, bmsg)
    else:
        hw = [
            _mm(h, wmsg[e]) + bmsg[e]
            for e in range(NUM_EDGE_TYPE)
        ]  # 4 x (KT, H)
        m_parts = []
        for k in range(k_tiles):
            if AGG_FLAT:
                hw_stack = jnp.concatenate(
                    [hw[e][k * t:(k + 1) * t] for e in range(NUM_EDGE_TYPE)],
                    axis=0,
                )  # (4T, H)
                m_k = _mm(adj[k], hw_stack)
            else:
                m_k = _mm(adj[k, 0], hw[0][k * t:(k + 1) * t])
                for e in range(1, NUM_EDGE_TYPE):
                    m_k = m_k + _mm(adj[k, e], hw[e][k * t:(k + 1) * t])
            m_parts.append(m_k)
        m = jnp.concatenate(m_parts, axis=0)  # (KT, H)
    x = jnp.concatenate([h, m], axis=-1)
    hidden = h.shape[-1]
    if MERGE_GATES:
        wzrn = jnp.concatenate([wz, wr, wn], axis=1)  # (2H, 3H)
        uzr = jnp.concatenate([uz, ur], axis=1)       # (H, 2H)
        gx = _mm(x, wzrn)
        gs = _mm(state, uzr)
        z = jax.nn.sigmoid(gx[:, :hidden] + gs[:, :hidden] + bz)
        r = jax.nn.sigmoid(gx[:, hidden:2 * hidden] + gs[:, hidden:] + br)
        n = jnp.tanh(
            gx[:, 2 * hidden:]
            + _mm(r * state, un) + bn
        )
    else:
        z = jax.nn.sigmoid(
            _mm(x, wz)
            + _mm(state, uz) + bz
        )
        r = jax.nn.sigmoid(
            _mm(x, wr)
            + _mm(state, ur) + br
        )
        n = jnp.tanh(
            _mm(x, wn)
            + _mm(r * state, un) + bn
        )
    return z * n + (1.0 - z) * state, (m, x, z, r, n)


def _fwd_kernel(n_layers, k_tiles, h0_ref, adj_ref, wmsg_ref, bmsg_ref,
                wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
                wn_ref, un_ref, bn_ref, out_ref):
    kt = k_tiles * TILE
    h = h0_ref[...].reshape(kt, h0_ref.shape[-1])
    state = jnp.zeros_like(h)
    adj = adj_ref[...].astype(jnp.float32)
    for l in range(n_layers):
        h, _ = _layer_fwd(
            k_tiles, h, state, adj, wmsg_ref[l], bmsg_ref[l],
            wz_ref[:], uz_ref[:], bz_ref[:],
            wr_ref[:], ur_ref[:], br_ref[:],
            wn_ref[:], un_ref[:], bn_ref[:],
        )
        state = h
    out_ref[...] = h.reshape(out_ref.shape)


def _bwd_kernel(n_layers, k_tiles, h0_ref, adj_ref, wmsg_ref, bmsg_ref,
                wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
                wn_ref, un_ref, bn_ref, dh_final_ref,
                dh0_ref, dwmsg_ref, dbmsg_ref,
                dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
                dwn_ref, dun_ref, dbn_ref,
                h_scratch):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        for ref in (dwmsg_ref, dbmsg_ref, dwz_ref, duz_ref, dbz_ref,
                    dwr_ref, dur_ref, dbr_ref, dwn_ref, dun_ref, dbn_ref):
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    t = TILE
    kt = k_tiles * t
    hidden = h0_ref.shape[-1]
    adj = adj_ref[...].astype(jnp.float32)
    weights = (wz_ref[:], uz_ref[:], bz_ref[:], wr_ref[:], ur_ref[:],
               br_ref[:], wn_ref[:], un_ref[:], bn_ref[:])

    # recompute forward, stashing each layer's input h in VMEM scratch
    h = h0_ref[...].reshape(kt, hidden)
    state = jnp.zeros_like(h)
    for l in range(n_layers):
        h_scratch[l] = h
        h, _ = _layer_fwd(k_tiles, h, state, adj, wmsg_ref[l], bmsg_ref[l],
                          *weights)
        state = h

    dh = dh_final_ref[...].reshape(kt, hidden)
    dh = _reverse_layers(
        n_layers, k_tiles, dh, h_scratch, adj, weights,
        wmsg_ref, bmsg_ref, dwmsg_ref, dbmsg_ref,
        dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
        dwn_ref, dun_ref, dbn_ref,
    )
    dh0_ref[...] = dh.reshape(dh0_ref.shape)


def _reverse_layers(n_layers, k_tiles, dh, h_scratch, adj, weights,
                    wmsg_ref, bmsg_ref, dwmsg_ref, dbmsg_ref,
                    dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
                    dwn_ref, dun_ref, dbn_ref, lo=0):
    """The shared reverse pass over layers [lo, n_layers) (recompute +
    grads), used by ALL backward kernels (_bwd_kernel seeds dh from
    dh_final; _bwd_readout_kernel from the readout backward; the
    two-pass half kernels pass lo/n_layers as their half range and
    seed/emit dh_mid at the boundary).  ``dh`` in, dh at the bottom of
    the range out (for lo==0 that is the h0 gradient; for lo==split it
    is dh_mid, INCLUDING the additive state path — layer lo's input is
    also layer lo's GRU state, so its dstate folds into the handoff);
    weight/bias grads accumulate into the d*_ref outputs.
    ``h_scratch[i]`` holds the input of layer lo+i."""
    (wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
     wn_ref, un_ref, bn_ref) = weights
    t = TILE
    kt = k_tiles * t
    hidden = dh.shape[-1]
    for l in range(n_layers - 1, lo - 1, -1):
        h_in = h_scratch[l - lo]
        state = jnp.zeros_like(h_in) if l == 0 else h_scratch[l - lo]
        _, (m, x, z, r, n) = _layer_fwd(
            k_tiles, h_in, state, adj, wmsg_ref[l], bmsg_ref[l], *weights
        )
        dz = dh * (n - state)
        dn = dh * z
        dstate = dh * (1.0 - z)
        dn_pre = dn * (1.0 - n * n)
        dz_pre = dz * z * (1.0 - z)
        drs = _mm(dn_pre, un_ref[:].T)
        dr = drs * state
        dstate = dstate + drs * r
        dr_pre = dr * r * (1.0 - r)
        dx = (
            _mm(dz_pre, wz_ref[:].T)
            + _mm(dr_pre, wr_ref[:].T)
            + _mm(dn_pre, wn_ref[:].T)
        )
        dh_in = dx[:, :hidden]
        dm = dx[:, hidden:2 * hidden]
        dstate = dstate + _mm(dz_pre, uz_ref[:].T) + _mm(dr_pre, ur_ref[:].T)

        # GRU weight grads (batched over the whole K*T block)
        dwz_ref[...] += _mm(x.T, dz_pre)
        dwr_ref[...] += _mm(x.T, dr_pre)
        dwn_ref[...] += _mm(x.T, dn_pre)
        duz_ref[...] += _mm(state.T, dz_pre)
        dur_ref[...] += _mm(state.T, dr_pre)
        dun_ref[...] += _mm((r * state).T, dn_pre)
        dbz_ref[...] += jnp.sum(dz_pre, axis=0, keepdims=True)
        dbr_ref[...] += jnp.sum(dr_pre, axis=0, keepdims=True)
        dbn_ref[...] += jnp.sum(dn_pre, axis=0, keepdims=True)

        # message backward
        if AGG_KBATCH:
            # one K-batched (K, 4T, T) x (K, T, H) dot_general for the
            # upstream hw grads, then batched weight/bias/input grads
            # over the edge-major (KT, 4H) layout (the forward's layout,
            # inverted by the same VMEM-local transpose)
            dm_b = dm.reshape(k_tiles, t, hidden)
            dhw_stack = _bmm(adj, dm_b, 1)  # (K, 4T, H): adj[k].T @ dm_k
            dhw_all = (
                dhw_stack.reshape(k_tiles, NUM_EDGE_TYPE, t, hidden)
                .transpose(0, 2, 1, 3)
                .reshape(kt, NUM_EDGE_TYPE * hidden)
            )
            w_all = jnp.concatenate(
                [wmsg_ref[l, e] for e in range(NUM_EDGE_TYPE)], axis=1
            )  # (H, 4H)
            dw_all = _mm(h_in.T, dhw_all)  # (H, 4H)
            db_all = jnp.sum(dhw_all, axis=0, keepdims=True)
            for e in range(NUM_EDGE_TYPE):
                dwmsg_ref[l, e] += dw_all[:, e * hidden:(e + 1) * hidden]
                dbmsg_ref[l, e] += db_all[:, e * hidden:(e + 1) * hidden]
            dh_in = dh_in + _mm(dhw_all, w_all.T)
        elif AGG_FLAT:
            # dhw_stack_k = adj_flat[k]^T @ dm_k : ONE (4T, T) x (T, H)
            # matmul per tile; per-edge rows are sublane-aligned slices
            dhw_stacks = [
                _mm(adj[k].T, dm[k * t:(k + 1) * t])  # (4T, H)
                for k in range(k_tiles)
            ]
            for e in range(NUM_EDGE_TYPE):
                dhw_e = jnp.concatenate(
                    [s[e * t:(e + 1) * t] for s in dhw_stacks], axis=0
                )  # (KT, H)
                dwmsg_ref[l, e] += _mm(h_in.T, dhw_e)
                dbmsg_ref[l, e] += jnp.sum(dhw_e, axis=0, keepdims=True)
                dh_in = dh_in + _mm(dhw_e, wmsg_ref[l, e].T)
        else:
            for e in range(NUM_EDGE_TYPE):
                dhw_e = jnp.concatenate(
                    [
                        _mm(adj[k, e].T, dm[k * t:(k + 1) * t])
                        for k in range(k_tiles)
                    ],
                    axis=0,
                )  # (KT, H)
                dwmsg_ref[l, e] += _mm(h_in.T, dhw_e)
                dbmsg_ref[l, e] += jnp.sum(dhw_e, axis=0, keepdims=True)
                dh_in = dh_in + _mm(dhw_e, wmsg_ref[l, e].T)
        # for l >= 1, state IS this layer's input tensor
        dh = dh_in + (dstate if l > 0 else 0.0)
    return dh


def _fwd_mid_kernel(n_layers, split, k_tiles, h0_ref, adj_ref, wmsg_ref,
                    bmsg_ref, wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
                    wn_ref, un_ref, bn_ref, out_ref, mid_ref):
    """Forward emitting BOTH h_final and h_mid (the input of layer
    ``split``) — the two-pass backward's HBM handoff residual."""
    kt = k_tiles * TILE
    h = h0_ref[...].reshape(kt, h0_ref.shape[-1])
    state = jnp.zeros_like(h)
    adj = adj_ref[...].astype(jnp.float32)
    for l in range(n_layers):
        if l == split:
            mid_ref[...] = h.reshape(mid_ref.shape)
        h, _ = _layer_fwd(
            k_tiles, h, state, adj, wmsg_ref[l], bmsg_ref[l],
            wz_ref[:], uz_ref[:], bz_ref[:],
            wr_ref[:], ur_ref[:], br_ref[:],
            wn_ref[:], un_ref[:], bn_ref[:],
        )
        state = h
    out_ref[...] = h.reshape(out_ref.shape)


def _bwd_half_kernel(lo, hi, k_tiles, hin_ref, adj_ref, wmsg_ref, bmsg_ref,
                     wz_ref, uz_ref, bz_ref, wr_ref, ur_ref, br_ref,
                     wn_ref, un_ref, bn_ref, dh_top_ref,
                     dh_bot_ref, dwmsg_ref, dbmsg_ref,
                     dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
                     dwn_ref, dun_ref, dbn_ref,
                     h_scratch):
    """Backward over layers [lo, hi): recompute forward from
    ``hin_ref`` (h0 for the bottom half, h_mid for the top half),
    reverse from ``dh_top_ref`` (dh_final or dh_mid), emit
    ``dh_bot_ref`` (dh_mid or dh0).  Weight grads accumulate across
    grid steps for the half's layers only (zeros elsewhere)."""
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        for ref in (dwmsg_ref, dbmsg_ref, dwz_ref, duz_ref, dbz_ref,
                    dwr_ref, dur_ref, dbr_ref, dwn_ref, dun_ref, dbn_ref):
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    t = TILE
    kt = k_tiles * t
    hidden = hin_ref.shape[-1]
    adj = adj_ref[...].astype(jnp.float32)
    weights = (wz_ref[:], uz_ref[:], bz_ref[:], wr_ref[:], ur_ref[:],
               br_ref[:], wn_ref[:], un_ref[:], bn_ref[:])

    h = hin_ref[...].reshape(kt, hidden)
    # layer lo's GRU state: zeros at lo == 0, else its own input (the
    # previous layer's output IS this h for the packed stack)
    state = jnp.zeros_like(h) if lo == 0 else h
    for l in range(lo, hi):
        h_scratch[l - lo] = h
        h, _ = _layer_fwd(k_tiles, h, state, adj, wmsg_ref[l], bmsg_ref[l],
                          *weights)
        state = h

    dh = dh_top_ref[...].reshape(kt, hidden)
    dh = _reverse_layers(
        hi, k_tiles, dh, h_scratch, adj, weights,
        wmsg_ref, bmsg_ref, dwmsg_ref, dbmsg_ref,
        dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
        dwn_ref, dun_ref, dbn_ref, lo=lo,
    )
    dh_bot_ref[...] = dh.reshape(dh_bot_ref.shape)


def _weight_args(msg_w, msg_b, gru):
    # msg_w: (L, 4, H, H); msg_b -> (L, 4, 1, H)
    msg_b2 = msg_b.reshape(msg_b.shape[0], msg_b.shape[1], 1, msg_b.shape[2])
    return (msg_w, msg_b2, gru["wz"], gru["uz"], gru["bz"].reshape(1, -1),
            gru["wr"], gru["ur"], gru["br"].reshape(1, -1),
            gru["wn"], gru["un"], gru["bn"].reshape(1, -1))


def _prep_adj(adj, k_tiles):
    """Pad tiles; flatten to (P, T, 4T) when AGG_FLAT
    (adj_flat[p, i, e*T+j] = adj[p, e, i, j]).  A 3-D input is already
    in the flat layout (ops/aggregate.adj_from_coo_flat builds it
    directly on device for the fused+COO production path)."""
    if AGG_FLAT:
        if adj.ndim == 4:
            p, e, t, _ = adj.shape
            adj = jnp.transpose(adj, (0, 2, 1, 3)).reshape(p, t, e * t)
    elif adj.ndim == 3:
        raise ValueError("flat (P, T, 4T) adjacency requires AGG_FLAT")
    return _pad_tiles(adj, k_tiles)


def _pad_tiles(x, k_tiles):
    p = x.shape[0]
    rem = (-p) % k_tiles
    if rem:
        x = jnp.pad(x, [(0, rem)] + [(0, 0)] * (x.ndim - 1))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_ggnn(n_layers: int, h0, adj, msg_w, msg_b, gru):
    """Run n_layers of GGNN over packed tiles.

    Args:
        h0: (P, T, H) f32 initial node states (embeddings).
        adj: (P, 4, T, T) adjacency, or pre-flattened (P, T, 4T) in the
            AGG_FLAT layout (adj_from_coo_flat) — bf16 recommended
            (exact for 0/1).
        msg_w: (L, 4, H, H) per-edge-type message weights.
        msg_b: (L, 4, H) per-edge-type message biases.
        gru: dict wz/wr/wn (2H, H), uz/ur/un (H, H), bz/br/bn (H,).
    Returns:
        (P, T, H) final node states.
    """
    out, _ = _fused_ggnn_fwd(n_layers, h0, adj, msg_w, msg_b, gru)
    return out


def _specs(k, t, h, args, dh=False):
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((k, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        (pl.BlockSpec((k, t, NUM_EDGE_TYPE * t), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
         if AGG_FLAT else
         pl.BlockSpec((k, NUM_EDGE_TYPE, t, t), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)),
        full(args[0].shape), full(args[1].shape),
        full(args[2].shape), full(args[3].shape), full((1, h)),
        full(args[5].shape), full(args[6].shape), full((1, h)),
        full(args[8].shape), full(args[9].shape), full((1, h)),
    ]
    if dh:
        specs.append(
            pl.BlockSpec((k, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    return specs


def _fused_ggnn_fwd(n_layers, h0, adj, msg_w, msg_b, gru,
                    block_tiles=None):
    p, t, h = h0.shape
    # late-bound module global so sweeps can override per-measurement
    k = min(block_tiles or DEFAULT_BLOCK_TILES, p)
    args = _weight_args(msg_w, msg_b, gru)
    adjp = _prep_adj(adj, k)
    h0p = _pad_tiles(h0, k)
    pp = h0p.shape[0]
    block = pl.BlockSpec((k, t, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    if TWOPASS and n_layers > 1:
        split = n_layers // 2
        out, mid = pl.pallas_call(
            functools.partial(_fwd_mid_kernel, n_layers, split, k),
            out_shape=(jax.ShapeDtypeStruct((pp, t, h), jnp.float32),
                       jax.ShapeDtypeStruct((pp, t, h), jnp.float32)),
            grid=(pp // k,),
            in_specs=_specs(k, t, h, args),
            out_specs=(block, block),
        )(h0p, adjp, *args)
        return out[:p], (h0, adj, msg_w, msg_b, gru, mid[:p])
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, k),
        out_shape=jax.ShapeDtypeStruct((pp, t, h), jnp.float32),
        grid=(pp // k,),
        in_specs=_specs(k, t, h, args),
        out_specs=block,
    )(h0p, adjp, *args)
    return out[:p], (h0, adj, msg_w, msg_b, gru, None)


def _fused_ggnn_bwd(n_layers, residuals, dh_final,
                    block_tiles=None):
    h0, adj, msg_w, msg_b, gru, h_mid = residuals
    if h_mid is not None:
        return _fused_ggnn_bwd_twopass(
            n_layers, h0, adj, msg_w, msg_b, gru, h_mid, dh_final,
            block_tiles)
    p, t, h = h0.shape
    k = min(block_tiles or DEFAULT_BWD_BLOCK_TILES, p)
    args = _weight_args(msg_w, msg_b, gru)
    adjp = _prep_adj(adj, k)
    h0p = _pad_tiles(h0, k)
    dhp = _pad_tiles(dh_final, k)
    pp = h0p.shape[0]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    msg_b4 = (msg_b.shape[0], msg_b.shape[1], 1, msg_b.shape[2])
    out_shapes = (
        jax.ShapeDtypeStruct((pp, t, h), jnp.float32),      # dh0
        jax.ShapeDtypeStruct(msg_w.shape, jnp.float32),     # dmsg_w
        jax.ShapeDtypeStruct(msg_b4, jnp.float32),          # dmsg_b
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),      # dwz
        jax.ShapeDtypeStruct((h, h), jnp.float32),          # duz
        jax.ShapeDtypeStruct((1, h), jnp.float32),          # dbz
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),      # dwr
        jax.ShapeDtypeStruct((h, h), jnp.float32),          # dur
        jax.ShapeDtypeStruct((1, h), jnp.float32),          # dbr
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),      # dwn
        jax.ShapeDtypeStruct((h, h), jnp.float32),          # dun
        jax.ShapeDtypeStruct((1, h), jnp.float32),          # dbn
    )
    out_specs = (
        pl.BlockSpec((k, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        full(msg_w.shape), full(msg_b4),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, h)), full((h, h)), full((1, h)),
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers, k),
        out_shape=out_shapes,
        grid=(pp // k,),
        in_specs=_specs(k, t, h, args, dh=True),
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_layers, k * t, h), jnp.float32)],
    )(h0p, adjp, *args, dhp)
    (dh0, dmsg_w, dmsg_b, dwz, duz, dbz, dwr, dur, dbr, dwn, dun, dbn) = outs
    dgru = {
        "wz": dwz, "uz": duz, "bz": dbz.reshape(-1),
        "wr": dwr, "ur": dur, "br": dbr.reshape(-1),
        "wn": dwn, "un": dun, "bn": dbn.reshape(-1),
    }
    return (dh0[:p], None, dmsg_w, dmsg_b.reshape(msg_b.shape), dgru)


def _half_bwd_call(lo, hi, n_layers, k, pp, t, h, args, msg_w, msg_b,
                   hin_p, adjp, dh_top_p):
    """One half-depth backward pallas_call over layers [lo, hi)."""
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    msg_b4 = (msg_b.shape[0], msg_b.shape[1], 1, msg_b.shape[2])
    out_shapes = (
        jax.ShapeDtypeStruct((pp, t, h), jnp.float32),      # dh_bot
        jax.ShapeDtypeStruct(msg_w.shape, jnp.float32),
        jax.ShapeDtypeStruct(msg_b4, jnp.float32),
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((k, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        full(msg_w.shape), full(msg_b4),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, h)), full((h, h)), full((1, h)),
    )
    return pl.pallas_call(
        functools.partial(_bwd_half_kernel, lo, hi, k),
        out_shape=out_shapes,
        grid=(pp // k,),
        in_specs=_specs(k, t, h, args, dh=True),
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((hi - lo, k * t, h), jnp.float32)],
    )(hin_p, adjp, *args, dh_top_p)


def _fused_ggnn_bwd_twopass(n_layers, h0, adj, msg_w, msg_b, gru, h_mid,
                            dh_final, block_tiles=None):
    """Two-pass backward (VERDICT r4 #1): top half [split, L) from the
    forward's h_mid residual, HBM handoff of dh_mid, bottom half
    [0, split) from h0.  Each kernel's VMEM scratch and unrolled
    reverse body halve, so the K block can exceed the single-kernel
    compile ceiling (GCNBMP_FUSED_BWD_K)."""
    p, t, h = h0.shape
    split = n_layers // 2
    k = min(block_tiles or DEFAULT_BWD_BLOCK_TILES, p)
    args = _weight_args(msg_w, msg_b, gru)
    adjp = _prep_adj(adj, k)
    pp = _pad_tiles(h0, k).shape[0]

    top = _half_bwd_call(split, n_layers, n_layers, k, pp, t, h, args,
                         msg_w, msg_b, _pad_tiles(h_mid, k), adjp,
                         _pad_tiles(dh_final, k))
    dh_mid = top[0]
    bot = _half_bwd_call(0, split, n_layers, k, pp, t, h, args,
                         msg_w, msg_b, _pad_tiles(h0, k), adjp, dh_mid)

    dh0 = bot[0][:p]
    dmsg_w = top[1] + bot[1]
    dmsg_b = (top[2] + bot[2]).reshape(msg_b.shape)
    names = ("wz", "uz", "bz", "wr", "ur", "br", "wn", "un", "bn")
    dgru = {}
    for i, name in enumerate(names):
        g = top[3 + i] + bot[3 + i]
        dgru[name] = g.reshape(-1) if name.startswith("b") else g
    return (dh0, None, dmsg_w, dmsg_b, dgru)


fused_ggnn.defvjp(_fused_ggnn_fwd, _fused_ggnn_bwd)


# ---------------------------------------------------------------------------
# Round 4 (VERDICT r3 #5b): the gated readout fused INTO the kernel.
# The XLA path spends ~2.2 ms isolated on readout matmuls + mask +
# their backward at h=32 (PROFILE_r03); with h and h0 already resident
# in VMEM at the last layer, emitting g_nodes = sigmoid([h,h0]Wi+bi)
# ⊙ (hWj+bj) ⊙ mask directly saves the h writeback, the XLA re-reads
# of h/h0, and several kernel launches.  The molecule segment-sum,
# HolE head, and loss stay in XLA (segment ops are one fused kernel
# there already).  Enabled per-call (fused_ggnn_readout); the plain
# fused_ggnn stays for co-attention paths that need raw atom states.


def _readout_fwd(h, h0, mask, wi, bi, wj, bj):
    pre_i = jnp.concatenate([h, h0], axis=-1)
    gate = jax.nn.sigmoid(_mm(pre_i, wi) + bi)
    out_j = _mm(h, wj) + bj
    return gate * out_j * mask


def _fwd_readout_kernel(n_layers, k_tiles, h0_ref, adj_ref, wmsg_ref,
                        bmsg_ref, wz_ref, uz_ref, bz_ref, wr_ref, ur_ref,
                        br_ref, wn_ref, un_ref, bn_ref,
                        mask_ref, wi_ref, bi_ref, wj_ref, bj_ref, out_ref):
    kt = k_tiles * TILE
    h0 = h0_ref[...].reshape(kt, h0_ref.shape[-1])
    h = h0
    state = jnp.zeros_like(h)
    adj = adj_ref[...].astype(jnp.float32)
    for l in range(n_layers):
        h, _ = _layer_fwd(
            k_tiles, h, state, adj, wmsg_ref[l], bmsg_ref[l],
            wz_ref[:], uz_ref[:], bz_ref[:],
            wr_ref[:], ur_ref[:], br_ref[:],
            wn_ref[:], un_ref[:], bn_ref[:],
        )
        state = h
    mask = mask_ref[...].reshape(kt, 1)
    g = _readout_fwd(h, h0, mask, wi_ref[:], bi_ref[:], wj_ref[:], bj_ref[:])
    out_ref[...] = g.reshape(out_ref.shape)


def _bwd_readout_kernel(n_layers, k_tiles, h0_ref, adj_ref, wmsg_ref,
                        bmsg_ref, wz_ref, uz_ref, bz_ref, wr_ref, ur_ref,
                        br_ref, wn_ref, un_ref, bn_ref,
                        mask_ref, wi_ref, bi_ref, wj_ref, bj_ref,
                        dg_ref,
                        dh0_ref, dwmsg_ref, dbmsg_ref,
                        dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
                        dwn_ref, dun_ref, dbn_ref,
                        dwi_ref, dbi_ref, dwj_ref, dbj_ref,
                        h_scratch):
    p = pl.program_id(0)

    @pl.when(p == 0)
    def _init():
        for ref in (dwmsg_ref, dbmsg_ref, dwz_ref, duz_ref, dbz_ref,
                    dwr_ref, dur_ref, dbr_ref, dwn_ref, dun_ref, dbn_ref,
                    dwi_ref, dbi_ref, dwj_ref, dbj_ref):
            ref[...] = jnp.zeros(ref.shape, jnp.float32)

    t = TILE
    kt = k_tiles * t
    hidden = h0_ref.shape[-1]
    adj = adj_ref[...].astype(jnp.float32)
    weights = (wz_ref[:], uz_ref[:], bz_ref[:], wr_ref[:], ur_ref[:],
               br_ref[:], wn_ref[:], un_ref[:], bn_ref[:])

    # recompute forward, stashing each layer's input h in VMEM scratch
    h0 = h0_ref[...].reshape(kt, hidden)
    h = h0
    state = jnp.zeros_like(h)
    for l in range(n_layers):
        h_scratch[l] = h
        h, _ = _layer_fwd(k_tiles, h, state, adj, wmsg_ref[l], bmsg_ref[l],
                          *weights)
        state = h

    # readout backward (h = final states, recomputed above)
    mask = mask_ref[...].reshape(kt, 1)
    wi, bi, wj, bj = wi_ref[:], bi_ref[:], wj_ref[:], bj_ref[:]
    pre_cat = jnp.concatenate([h, h0], axis=-1)
    gate = jax.nn.sigmoid(_mm(pre_cat, wi) + bi)
    out_j = _mm(h, wj) + bj
    dg = dg_ref[...].reshape(kt, -1)
    dgate = dg * out_j * mask
    dout_j = dg * gate * mask
    dpre_i = dgate * gate * (1.0 - gate)
    dwi_ref[...] += _mm(pre_cat.T, dpre_i)
    dbi_ref[...] += jnp.sum(dpre_i, axis=0, keepdims=True)
    dwj_ref[...] += _mm(h.T, dout_j)
    dbj_ref[...] += jnp.sum(dout_j, axis=0, keepdims=True)
    dcat = _mm(dpre_i, wi.T)            # (KT, 2H)
    dh = dcat[:, :hidden] + _mm(dout_j, wj.T)
    dh0_direct = dcat[:, hidden:]       # h0's direct readout term

    dh = _reverse_layers(
        n_layers, k_tiles, dh, h_scratch, adj, weights,
        wmsg_ref, bmsg_ref, dwmsg_ref, dbmsg_ref,
        dwz_ref, duz_ref, dbz_ref, dwr_ref, dur_ref, dbr_ref,
        dwn_ref, dun_ref, dbn_ref,
    )
    dh0_ref[...] = (dh + dh0_direct).reshape(dh0_ref.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_ggnn_readout(n_layers: int, h0, adj, msg_w, msg_b, gru,
                       node_mask, ro_wi, ro_bi, ro_wj, ro_bj):
    """fused_ggnn + the gated readout in the SAME kernel: returns
    g_nodes (P, T, D) = sigmoid([h, h0] Wi + bi) ⊙ (h Wj + bj) ⊙ mask
    (reference readout semantics, models/ggnn.py:333-341), ready for
    the molecule segment-sum.  node_mask: (P, T) f32.  ro_wi: (2H, D),
    ro_bi: (D,), ro_wj: (H, D), ro_bj: (D,)."""
    out, _ = _fused_ggnn_readout_fwd(
        n_layers, h0, adj, msg_w, msg_b, gru, node_mask,
        ro_wi, ro_bi, ro_wj, ro_bj)
    return out


def _ro_specs(k, t, h, d, args):
    base = _specs(k, t, h, args)
    base.extend([
        # mask rides as (P, T, 1): a 2-D (K, T) block would break the
        # TPU lowering's (8, 128) divisibility rule for K < 8 (the
        # backward's K=4 blocks — caught on hardware, SWEEPS_r04
        # fused*_ro error rows of 08:45)
        pl.BlockSpec((k, t, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2 * h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ])
    return base


def _fused_ggnn_readout_fwd(n_layers, h0, adj, msg_w, msg_b, gru,
                            node_mask, ro_wi, ro_bi, ro_wj, ro_bj,
                            block_tiles=None):
    p, t, h = h0.shape
    d = ro_wj.shape[-1]
    k = min(block_tiles or DEFAULT_BLOCK_TILES, p)
    args = _weight_args(msg_w, msg_b, gru)
    adjp = _prep_adj(adj, k)
    h0p = _pad_tiles(h0, k)
    maskp = _pad_tiles(node_mask.astype(jnp.float32), k)[..., None]
    pp = h0p.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_readout_kernel, n_layers, k),
        out_shape=jax.ShapeDtypeStruct((pp, t, d), jnp.float32),
        grid=(pp // k,),
        in_specs=_ro_specs(k, t, h, d, args),
        out_specs=pl.BlockSpec((k, t, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(h0p, adjp, *args, maskp, ro_wi, ro_bi.reshape(1, -1),
      ro_wj, ro_bj.reshape(1, -1))
    return out[:p], (h0, adj, msg_w, msg_b, gru, node_mask,
                     ro_wi, ro_bi, ro_wj, ro_bj)


def _fused_ggnn_readout_bwd(n_layers, residuals, dg, block_tiles=None):
    (h0, adj, msg_w, msg_b, gru, node_mask,
     ro_wi, ro_bi, ro_wj, ro_bj) = residuals
    p, t, h = h0.shape
    d = ro_wj.shape[-1]
    k = min(block_tiles or DEFAULT_BWD_BLOCK_TILES, p)
    args = _weight_args(msg_w, msg_b, gru)
    adjp = _prep_adj(adj, k)
    h0p = _pad_tiles(h0, k)
    maskp = _pad_tiles(node_mask.astype(jnp.float32), k)[..., None]
    dgp = _pad_tiles(dg, k)
    pp = h0p.shape[0]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    msg_b4 = (msg_b.shape[0], msg_b.shape[1], 1, msg_b.shape[2])
    out_shapes = (
        jax.ShapeDtypeStruct((pp, t, h), jnp.float32),      # dh0
        jax.ShapeDtypeStruct(msg_w.shape, jnp.float32),
        jax.ShapeDtypeStruct(msg_b4, jnp.float32),
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((2 * h, h), jnp.float32),
        jax.ShapeDtypeStruct((h, h), jnp.float32),
        jax.ShapeDtypeStruct((1, h), jnp.float32),
        jax.ShapeDtypeStruct((2 * h, d), jnp.float32),      # dwi
        jax.ShapeDtypeStruct((1, d), jnp.float32),          # dbi
        jax.ShapeDtypeStruct((h, d), jnp.float32),          # dwj
        jax.ShapeDtypeStruct((1, d), jnp.float32),          # dbj
    )
    out_specs = (
        pl.BlockSpec((k, t, h), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        full(msg_w.shape), full(msg_b4),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, h)), full((h, h)), full((1, h)),
        full((2 * h, d)), full((1, d)), full((h, d)), full((1, d)),
    )
    in_specs = _ro_specs(k, t, h, d, args)
    in_specs.append(
        pl.BlockSpec((k, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_readout_kernel, n_layers, k),
        out_shape=out_shapes,
        grid=(pp // k,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((n_layers, k * t, h), jnp.float32)],
    )(h0p, adjp, *args, maskp, ro_wi, ro_bi.reshape(1, -1),
      ro_wj, ro_bj.reshape(1, -1), dgp)
    (dh0, dmsg_w, dmsg_b, dwz, duz, dbz, dwr, dur, dbr, dwn, dun, dbn,
     dwi, dbi, dwj, dbj) = outs
    dgru = {
        "wz": dwz, "uz": duz, "bz": dbz.reshape(-1),
        "wr": dwr, "ur": dur, "br": dbr.reshape(-1),
        "wn": dwn, "un": dun, "bn": dbn.reshape(-1),
    }
    return (dh0[:p], None, dmsg_w, dmsg_b.reshape(msg_b.shape), dgru,
            None, dwi, dbi.reshape(-1), dwj, dbj.reshape(-1))


fused_ggnn_readout.defvjp(_fused_ggnn_readout_fwd, _fused_ggnn_readout_bwd)


def split_message_kernel(w: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """(H, 4H) GraphLinear kernel with edge-fastest columns -> per-edge
    blocks (4, H, H) with W_e[i, c] = W[i, c*4 + e]."""
    return w.reshape(w.shape[0], hidden, NUM_EDGE_TYPE).transpose(2, 0, 1)


def split_message_bias(b: jnp.ndarray, hidden: int) -> jnp.ndarray:
    return b.reshape(hidden, NUM_EDGE_TYPE).T


def params_to_fused(params: dict, n_layers: int, weight_tying: bool,
                    hidden: int) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Convert a GGNN/PackedGGNN flax param tree ('update_i', 'gru') to
    the fused kernel's weight format (differentiable — gradients flow
    back through the permutation/stack to the original layout)."""
    ws, bs = [], []
    for l in range(n_layers):
        d = params[f"update_{0 if weight_tying else l}"]["message"]["dense"]
        ws.append(split_message_kernel(d["kernel"], hidden))
        bs.append(split_message_bias(d["bias"], hidden))
    msg_w = jnp.stack(ws)  # (L, 4, H, H)
    msg_b = jnp.stack(bs)  # (L, 4, H)
    g = params["gru"]
    gru = {
        "wz": g["W_z"]["kernel"], "uz": g["U_z"]["kernel"],
        "bz": g["W_z"]["bias"] + g["U_z"]["bias"],
        "wr": g["W_r"]["kernel"], "ur": g["U_r"]["kernel"],
        "br": g["W_r"]["bias"] + g["U_r"]["bias"],
        "wn": g["W"]["kernel"], "un": g["U"]["kernel"],
        "bn": g["W"]["bias"] + g["U"]["bias"],
    }
    return msg_w, msg_b, gru
