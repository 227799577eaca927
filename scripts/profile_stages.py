"""Per-stage timing decomposition of the flagship train step (VERDICT r2
weak #1: the 'op-latency-bound at h=32' claim needs direct evidence).

jax.profiler traces cannot be fetched through the axon relay (the trace
runs host-side while compute is remote), so this measures the binary-
search decomposition instead: each pipeline stage of the flagship packed
GGNN step (B=2048 pairs, 8 untied layers, h=32 + HolE) is timed IN
ISOLATION under jit on the real device, with a per-iteration scalar
input perturbation so XLA cannot constant-fold the work away.  All
tensors are passed as jit ARGUMENTS (never closure-captured) so nothing
large embeds into the program as a literal.  The gap between the stage
sum and the full step, plus the HLO instruction count of the compiled
step, quantifies how much of the step is per-kernel launch overhead vs
real compute.

Writes docs/PROFILE_r05.jsonl (one JSON line per stage) and prints a
table.  Run on the TPU (takes ~10 min, ~12 remote compiles).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import bench

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "PROFILE_r05.jsonl")

HIDDEN = int(os.environ.get("GCNBMP_BENCH_HIDDEN", "32"))
LAYERS = 8
ITERS = 30


def emit(row):
    row["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf).astype(jnp.float32))


def timeit(fn, *args, iters=ITERS):
    """Warm once, then loop with a per-call scalar perturbation (first
    positional arg) and a single value fetch at the end (the axon relay
    pipelines dispatches; block_until_ready does not actually block)."""
    out = fn(jnp.float32(0.0), *args)
    _force(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jnp.float32((i + 1) * 1e-12), *args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def hlo_instruction_count(compiled) -> dict:
    """Count executed-instruction classes in the compiled entry
    computation — a proxy for kernel-launch count."""
    txt = compiled.as_text()
    m = re.search(r"ENTRY [^{]+\{(.*?)\n\}", txt, re.S)
    body = m.group(1) if m else txt
    lines = [l.strip() for l in body.split("\n") if "=" in l]
    return {
        "total_instructions": len(lines),
        "fusion": sum("fusion(" in l for l in lines),
        "custom_call": sum("custom-call" in l for l in lines),
        "copy": sum(re.search(r"= \S+\[?[^=]* copy\(", l) is not None
                    for l in lines),
        "dot_conv": sum(("dot(" in l or "convolution(" in l) for l in lines),
        "scatter": sum("scatter" in l for l in lines),
        "parameters": sum("parameter(" in l for l in lines),
    }


def main():
    device = jax.devices()[0]
    print(f"# device: {device}", file=sys.stderr)
    bench.HIDDEN = HIDDEN
    from gcnbmp_tpu.data.packing import (
        pack_pair_dataset_batch,
        pack_pair_dataset_coo,
    )
    from gcnbmp_tpu.models.packed import _segment_mol_sum, make_packed_predictor
    from gcnbmp_tpu.train.loop import sigmoid_cross_entropy

    ds = bench.build_dataset()
    packed = pack_pair_dataset_batch(ds, list(range(bench.BATCH)))
    p_tiles, t = packed.atom_ids.shape
    h = HIDDEN
    rows = p_tiles * t
    put = lambda x: jax.device_put(jnp.asarray(x), device)
    atom_ids = put(packed.atom_ids)
    adj = put(packed.adj)
    adj_flat = put(np.ascontiguousarray(
        np.transpose(packed.adj, (0, 2, 1, 3)).reshape(p_tiles, t, 4 * t)))
    mol_id, node_mask = put(packed.mol_id), put(packed.node_mask)
    li, ri = put(packed.left_index), put(packed.right_index)
    y = put(packed.labels)

    predictor = make_packed_predictor(
        fp_hidden_dim=h, fp_out_dim=h, conv_layers=LAYERS,
        weight_tying=False, sim_method="hole",
    )
    args = (atom_ids, adj, mol_id, node_mask, li, ri)
    params = jax.device_put(
        predictor.init(jax.random.PRNGKey(0), *args)["params"], device)
    optimizer = optax.adam(1e-3)
    opt_state = jax.device_put(optimizer.init(params), device)

    rng = np.random.default_rng(0)
    hs = put(rng.normal(size=(p_tiles, t, h)).astype(np.float32) * 0.1)
    msgs4 = put(rng.normal(size=(p_tiles, 4 * t, h)).astype(np.float32) * 0.1)
    gmol = put(rng.normal(size=(2 * bench.BATCH, h)).astype(np.float32) * 0.1)

    coo = pack_pair_dataset_coo(ds, list(range(bench.BATCH)))
    e_arrs = tuple(put(a) for a in (coo.e_tile, coo.e_type, coo.e_src,
                                    coo.e_dst, coo.e_mask))

    # ---- stage kernels (everything an argument; eps defeats folding) --
    @jax.jit
    def s_embed(eps, p, ids):
        return jnp.take(p["encoder"]["embed"]["embedding"] * (1 + eps),
                        ids, axis=0)

    @jax.jit
    def s_message(eps, p, x):
        out = (x * (1 + eps)).reshape(rows, h)
        acc = 0.0
        for l in range(LAYERS):
            d = p["encoder"][f"update_{l}"]["message"]["dense"]
            acc = acc + (out @ d["kernel"] + d["bias"])
        return acc

    @jax.jit
    def s_agg(eps, af, m):
        m = m * (1 + eps)
        acc = 0.0
        for _ in range(LAYERS):
            acc = acc + jax.lax.dot_general(
                af, m, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        return acc

    @jax.jit
    def s_gru(eps, p, x):
        g = p["encoder"]["gru"]
        state = x.reshape(rows, h) * (1 + eps)
        for _ in range(LAYERS):
            xin = jnp.concatenate([state, state], axis=-1)
            z = jax.nn.sigmoid(xin @ g["W_z"]["kernel"] + g["W_z"]["bias"]
                               + state @ g["U_z"]["kernel"] + g["U_z"]["bias"])
            r = jax.nn.sigmoid(xin @ g["W_r"]["kernel"] + g["W_r"]["bias"]
                               + state @ g["U_r"]["kernel"] + g["U_r"]["bias"])
            n = jnp.tanh(xin @ g["W"]["kernel"] + g["W"]["bias"]
                         + (r * state) @ g["U"]["kernel"] + g["U"]["bias"])
            state = z * n + (1 - z) * state
        return state

    @jax.jit
    def s_readout(eps, p, x, mid, mask, l_idx, r_idx):
        ro = p["encoder"]["readout_0"]
        hh = x * (1 + eps)
        gate = jax.nn.sigmoid(
            jnp.concatenate([hh, hh], axis=-1) @ ro["i"]["dense"]["kernel"]
            + ro["i"]["dense"]["bias"])
        gn = gate * (hh @ ro["j"]["dense"]["kernel"] + ro["j"]["dense"]["bias"])
        gn = gn * mask[..., None]
        g = _segment_mol_sum(gn, mid, 2 * bench.BATCH)
        return jnp.take(g, l_idx, axis=0) + jnp.take(g, r_idx, axis=0)

    @jax.jit
    def s_head(eps, p, g, labels):
        gg = (g * (1 + eps))[:bench.BATCH]
        logits = predictor.head.apply({"params": p["head"]}, gg, gg)
        return sigmoid_cross_entropy(jnp.reshape(logits, labels.shape), labels)

    @jax.jit
    def s_scatter(eps, et, ety, es, ed, em):
        from gcnbmp_tpu.ops.aggregate import adj_from_coo
        return adj_from_coo(et, ety, es, ed, em + eps,
                            num_tiles=p_tiles, tile=t)

    def loss_fn(p, a):
        logits = predictor.apply({"params": p}, *a)
        return sigmoid_cross_entropy(jnp.reshape(logits, y.shape), y)

    @jax.jit
    def s_fwd(eps, p, a, labels):
        p2 = jax.tree.map(lambda x: x * (1 + eps), p)
        logits = predictor.apply({"params": p2}, *a)
        return sigmoid_cross_entropy(jnp.reshape(logits, labels.shape), labels)

    @jax.jit
    def s_fwdbwd(eps, p, a, labels):
        def lf(pp):
            logits = predictor.apply({"params": pp}, *a)
            return sigmoid_cross_entropy(
                jnp.reshape(logits, labels.shape), labels)
        p2 = jax.tree.map(lambda x: x * (1 + eps), p)
        return jax.value_and_grad(lf)(p2)

    @jax.jit
    def s_full(eps, p, s, a, labels):
        def lf(pp):
            logits = predictor.apply({"params": pp}, *a)
            return sigmoid_cross_entropy(
                jnp.reshape(logits, labels.shape), labels)
        p2 = jax.tree.map(lambda x: x * (1 + eps), p)
        l, grads = jax.value_and_grad(lf)(p2)
        updates, s = optimizer.update(grads, s, p2)
        return optax.apply_updates(p2, updates), l

    _, grads_const = s_fwdbwd(jnp.float32(0.0), params, args, y)
    _force(grads_const)  # surface any async failure HERE, not at stage 1

    @jax.jit
    def s_adam(eps, p, s, g):
        g2 = jax.tree.map(lambda x: x * (1 + eps), g)
        updates, s = optimizer.update(g2, s, p)
        return optax.apply_updates(p, updates)

    stages = [
        ("embed", lambda e: s_embed(e, params, atom_ids)),
        ("message_x8", lambda e: s_message(e, params, hs)),
        ("aggregate_x8", lambda e: s_agg(e, adj_flat, msgs4)),
        ("gru_x8", lambda e: s_gru(e, params, hs)),
        ("readout_segsum", lambda e: s_readout(
            e, params, hs, mol_id, node_mask, li, ri)),
        ("hole_loss", lambda e: s_head(e, params, gmol, y)),
        ("adj_scatter_coo", lambda e: s_scatter(e, *e_arrs)),
        ("adam_update", lambda e: s_adam(e, params, opt_state, grads_const)),
        ("forward_total", lambda e: s_fwd(e, params, args, y)),
        ("fwd_bwd_total", lambda e: s_fwdbwd(e, params, args, y)[0]),
        ("full_step_total", lambda e: s_full(e, params, opt_state, args, y)[1]),
    ]
    results = {}
    for name, fn in stages:
        try:
            dt = timeit(fn)
        except Exception as e:
            emit({"stage": name,
                  "error": f"{type(e).__name__}: {e}"[:300]})
            continue
        results[name] = dt
        emit({"stage": name, "ms": round(dt * 1e3, 4), "hidden": h,
              "batch_pairs": bench.BATCH, "layers": LAYERS})

    # ---- HLO instruction counts of the compiled full step -------------
    try:
        compiled = s_full.lower(
            jnp.float32(0.0), params, opt_state, args, y).compile()
        counts = hlo_instruction_count(compiled)
        emit({"stage": "hlo_counts_full_step", **counts})
    except Exception as e:  # HLO text may be unavailable via the relay
        emit({"stage": "hlo_counts_full_step",
              "error": f"{type(e).__name__}: {e}"[:300]})

    fwd_keys = ("embed", "message_x8", "aggregate_x8", "gru_x8",
                "readout_segsum", "hole_loss")
    if all(k in results for k in fwd_keys) and "forward_total" in results:
        fwd_stage_sum = sum(results[k] for k in fwd_keys)
        emit({
            "stage": "summary",
            "hidden": h,
            "fwd_stage_sum_ms": round(fwd_stage_sum * 1e3, 3),
            "forward_total_ms": round(results["forward_total"] * 1e3, 3),
            "fwd_bwd_total_ms": round(
                results.get("fwd_bwd_total", float("nan")) * 1e3, 3),
            "full_step_ms": round(
                results.get("full_step_total", float("nan")) * 1e3, 3),
            "launch_overhead_fwd_ms": round(
                (results["forward_total"] - fwd_stage_sum) * 1e3, 3),
        })


if __name__ == "__main__":
    main()
