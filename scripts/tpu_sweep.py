"""One-process TPU perf sweep over (hidden width x precision x path).

Usage:  python scripts/tpu_sweep.py packed32 bf16_32 packed64 ...
        (no args = the standard width/precision grid, packed paths only)

Each config re-uses bench.py's measurement harness with its module
globals re-pointed, runs on the default device (the real TPU under the
driver), and appends one JSON line per row to docs/SWEEPS_r02.jsonl.
Remote compiles cost 1-3 min per distinct shape — run in background.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "SWEEPS_r05.jsonl")


def emit(row):
    row["ts"] = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_packed(name, hidden, dtype, adj_bf16=False):
    bench.HIDDEN = hidden
    bench.COMPUTE_DTYPE = dtype
    bench.ADJ_BF16 = adj_bf16
    device = jax.devices()[0]
    eps, dt, edges, occ, tiles, atoms = bench.measure_packed(device, bench.ITERS)
    dense, useful = bench.step_flops(tiles, atoms, edges, hidden)
    emit({
        "config": name, "path": "packed", "hidden": hidden,
        "dtype": "bf16" if dtype is not None else "f32",
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
        "mfu": round(dense / dt / bench.V5E_PEAK_FLOPS, 5),
        "mfu_useful": round(useful / dt / bench.V5E_PEAK_FLOPS, 5),
    })


def run_scan(name, hidden, dtype, adj_bf16=False):
    bench.HIDDEN = hidden
    bench.COMPUTE_DTYPE = dtype
    bench.ADJ_BF16 = adj_bf16
    device = jax.devices()[0]
    eps, dt, edges = bench.measure_packed_scan(device, bench.ITERS)
    # tiles/atoms identical to the packed batch (same dataset/pack)
    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch

    packed = pack_pair_dataset_batch(bench.build_dataset(),
                                     list(range(bench.BATCH)))
    import numpy as np

    dense, useful = bench.step_flops(
        packed.num_tiles, float(np.sum(packed.node_mask)), edges, hidden)
    emit({
        "config": name, "path": "scan", "hidden": hidden,
        "dtype": "bf16" if dtype is not None else "f32",
        "batch": bench.BATCH,
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
        "mfu": round(dense / dt / bench.V5E_PEAK_FLOPS, 5),
        "mfu_useful": round(useful / dt / bench.V5E_PEAK_FLOPS, 5),
    })


def run_scan_batch(name, hidden, dtype, batch):
    """Batch-scaling probe (round 4): the h=32 step is launch-bound
    (~429 kernel executions, PROFILE_r03), and the headline metric is
    edges/s — a larger batch amortizes the fixed launch floor over
    more edges.  Scan stages S dense batches in HBM: B=8192 x10 is
    ~1 GB f32 adjacency, well inside v5e HBM."""
    saved = bench.BATCH
    bench.BATCH = batch
    try:
        run_scan(name, hidden, dtype)
    finally:
        bench.BATCH = saved


def run_coo_scan_batch(name, hidden, dtype, batch):
    saved = bench.BATCH
    bench.BATCH = batch
    try:
        run_coo_scan(name, hidden, dtype)
    finally:
        bench.BATCH = saved


def run_infer(name, hidden, dtype):
    """Forward-only (serving) throughput on the packed path."""
    import numpy as np
    import optax

    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch
    from gcnbmp_tpu.models.packed import make_packed_predictor

    bench.HIDDEN = hidden
    device = jax.devices()[0]
    ds = bench.build_dataset()
    packed = pack_pair_dataset_batch(ds, list(range(bench.BATCH)))
    predictor = make_packed_predictor(
        fp_hidden_dim=hidden, fp_out_dim=hidden, conv_layers=bench.LAYERS,
        weight_tying=False, sim_method="hole", compute_dtype=dtype,
    )
    put = lambda x: jax.device_put(jnp.asarray(x), device)
    args = (
        put(packed.atom_ids), put(packed.adj), put(packed.mol_id),
        put(packed.node_mask), put(packed.left_index), put(packed.right_index),
    )
    params = jax.device_put(
        predictor.init(jax.random.PRNGKey(0), *args)["params"], device)

    @jax.jit
    def fwd(p, noise):
        # noise-perturbed params defeat XLA's loop-invariant hoisting
        # (see docs/STATUS r1: scanning an identical forward measures
        # hoisted compute, not inference)
        p2 = jax.tree.map(lambda x: x * (1.0 + noise), p)
        return predictor.apply({"params": p2}, *args)

    out = fwd(params, jnp.float32(0.0))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    n = 50
    for i in range(n):
        out = fwd(params, jnp.float32(i * 1e-9))
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    edges = float(packed.num_edges)
    emit({
        "config": name, "path": "infer", "hidden": hidden,
        "dtype": "bf16" if dtype is not None else "f32",
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(edges / dt),
        "pairs_per_s": round(bench.BATCH / dt),
    })


def run_infer_fused(name, hidden, fused_ro=True):
    """Forward-only (serving) throughput through the fused Pallas
    kernel — with the kernel-fused gated readout when ``fused_ro``
    (the readout-fused FORWARD lowers fine at production shapes; the
    backward is compiler-limited, SWEEPS_r04)."""
    import numpy as np

    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch
    from gcnbmp_tpu.models import packed as packed_mod
    from gcnbmp_tpu.models.packed import (
        fused_pair_logits,
        make_packed_predictor,
    )

    bench.HIDDEN = hidden
    device = jax.devices()[0]
    ds = bench.build_dataset()
    packed = pack_pair_dataset_batch(ds, list(range(bench.BATCH)))
    predictor = make_packed_predictor(
        fp_hidden_dim=hidden, fp_out_dim=hidden, conv_layers=bench.LAYERS,
        weight_tying=False, sim_method="hole",
    )
    put = lambda x: jax.device_put(jnp.asarray(x), device)
    args = (
        put(packed.atom_ids), put(packed.adj.astype(jnp.bfloat16)),
        put(packed.mol_id), put(packed.node_mask),
        put(packed.left_index), put(packed.right_index),
    )
    params = jax.device_put(
        predictor.init(jax.random.PRNGKey(0), put(packed.atom_ids),
                       put(packed.adj), *args[2:])["params"], device)
    saved_ro = packed_mod.FUSED_READOUT
    packed_mod.FUSED_READOUT = fused_ro
    try:
        @jax.jit
        def fwd(p, noise):
            p2 = jax.tree.map(lambda x: x * (1.0 + noise), p)
            return fused_pair_logits(predictor, p2, *args)

        out = fwd(params, jnp.float32(0.0))
        float(jnp.sum(out))
        t0 = time.perf_counter()
        n = 50
        for i in range(n):
            out = fwd(params, jnp.float32(i * 1e-9))
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / n
    finally:
        packed_mod.FUSED_READOUT = saved_ro
    edges = float(packed.num_edges)
    emit({
        "config": name, "path": "infer_fused", "hidden": hidden,
        "fused_readout": fused_ro,
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(edges / dt),
        "pairs_per_s": round(bench.BATCH / dt),
    })


def run_circ(name="circ"):
    """Micro-bench of the two circular-correlation forms (VERDICT r1 #7):
    fwd+bwd at B=2048 over D in {16,32,64,128}."""
    import numpy as np

    from gcnbmp_tpu.ops.circular import (
        circular_correlation,
        circular_correlation_matmul,
    )

    device = jax.devices()[0]
    b = 2048
    rows = {}
    for d in (16, 32, 64, 128):
        a = jax.device_put(jnp.asarray(
            np.random.default_rng(0).normal(size=(b, d)).astype(np.float32)
        ), device)
        c = jax.device_put(jnp.asarray(
            np.random.default_rng(1).normal(size=(b, d)).astype(np.float32)
        ), device)
        for label, fn in (("rfft", circular_correlation),
                          ("matmul", circular_correlation_matmul)):
            try:
                f = jax.jit(jax.value_and_grad(
                    lambda x, y, fn=fn: jnp.sum(fn(x, y) ** 2), argnums=(0, 1)
                ))
                v, g = f(a, c)
                float(v)
                t0 = time.perf_counter()
                n = 200
                for _ in range(n):
                    v, g = f(a, c)
                float(v)
                rows[f"D{d}_{label}_us"] = round(
                    (time.perf_counter() - t0) / n * 1e6, 1
                )
            except Exception as e:
                rows[f"D{d}_{label}_us"] = f"{type(e).__name__}"
    emit({"config": name, "path": "circ_microbench", "batch": b, **rows})


def run_fused(name, hidden, bwd_k=None, kbatch=None, fused_ro=None,
              twopass=None, merge_gates=None):
    from gcnbmp_tpu.models import packed as packed_mod
    from gcnbmp_tpu.ops import fused_ggnn

    bench.HIDDEN = hidden
    bench.COMPUTE_DTYPE = None
    saved = fused_ggnn.DEFAULT_BWD_BLOCK_TILES
    saved_kb = fused_ggnn.AGG_KBATCH
    saved_ro = packed_mod.FUSED_READOUT
    saved_tp = fused_ggnn.TWOPASS
    if bwd_k is not None:
        fused_ggnn.DEFAULT_BWD_BLOCK_TILES = bwd_k
    if kbatch is not None:
        fused_ggnn.AGG_KBATCH = kbatch
    if fused_ro is not None:
        packed_mod.FUSED_READOUT = fused_ro
    if twopass is not None:
        fused_ggnn.TWOPASS = twopass
    saved_mg = fused_ggnn.MERGE_GATES
    if merge_gates is not None:
        fused_ggnn.MERGE_GATES = merge_gates
    device = jax.devices()[0]
    try:
        eps, dt, edges = bench.measure_fused(device, bench.ITERS)
    finally:
        fused_ggnn.DEFAULT_BWD_BLOCK_TILES = saved
        fused_ggnn.AGG_KBATCH = saved_kb
        packed_mod.FUSED_READOUT = saved_ro
        fused_ggnn.TWOPASS = saved_tp
        fused_ggnn.MERGE_GATES = saved_mg
    emit({
        "config": name, "path": "fused", "hidden": hidden,
        "bwd_k": bwd_k or saved,
        "kbatch": kbatch if kbatch is not None else saved_kb,
        "fused_readout": (fused_ro if fused_ro is not None else saved_ro),
        "twopass": twopass if twopass is not None else saved_tp,
        "dtype": "bf16" if fused_ggnn.MATMUL_BF16 else "f32",
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
    })


def run_coo_scan(name, hidden, dtype=None):
    """XLA COO+scan train step (the production streaming input path)."""
    bench.HIDDEN = hidden
    bench.COMPUTE_DTYPE = dtype
    device = jax.devices()[0]
    eps, dt, edges = bench.measure_coo_scan(device, bench.ITERS)
    emit({
        "config": name, "path": "coo_scan", "hidden": hidden,
        "dtype": "bf16" if dtype is not None else "f32",
        "batch": bench.BATCH,
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
    })


def run_fused_coo_scan(name, hidden, bwd_k=None, kbatch=None,
                       fused_ro=None, twopass=None):
    """The fused+COO+scan production config (round 3): wire-compact
    batches stacked in HBM, one lax.scan dispatch, adjacency
    scatter-built per step in the kernel's flat layout, message/GRU
    stack in the fused Pallas kernel."""
    import numpy as np
    import optax

    from gcnbmp_tpu.data import native_pack
    from gcnbmp_tpu.data.packing import pack_pair_dataset_coo
    from gcnbmp_tpu.models.packed import (
        FusedCompactApply,
        compact_coo_arrays,
        make_packed_predictor,
    )
    from gcnbmp_tpu.ops import fused_ggnn
    from gcnbmp_tpu.train.loop import (
        make_packed_scan_train_step,
        sigmoid_cross_entropy,
    )

    from gcnbmp_tpu.models import packed as packed_mod

    bench.HIDDEN = hidden
    saved = fused_ggnn.DEFAULT_BWD_BLOCK_TILES
    saved_kb = fused_ggnn.AGG_KBATCH
    saved_ro = packed_mod.FUSED_READOUT
    saved_tp = fused_ggnn.TWOPASS
    if bwd_k is not None:
        fused_ggnn.DEFAULT_BWD_BLOCK_TILES = bwd_k
    if kbatch is not None:
        fused_ggnn.AGG_KBATCH = kbatch
    if fused_ro is not None:
        packed_mod.FUSED_READOUT = fused_ro
    if twopass is not None:
        fused_ggnn.TWOPASS = twopass
    device = jax.devices()[0]
    try:
        ds = bench.build_dataset()
        rng = np.random.default_rng(1)
        cache = (native_pack.PairDatasetCache(ds)
                 if native_pack.native_pack_available() else None)
        chunks = []
        for _ in range(bench.SCAN_STEPS):
            idx = rng.permutation(bench.BATCH).tolist()
            chunks.append(
                native_pack.pack_pairs_native(cache, idx) if cache is not None
                else pack_pair_dataset_coo(ds, idx))
        argses = [compact_coo_arrays(b) for b in chunks]
        stacked = tuple(
            np.stack([a[i] for a in argses]) for i in range(len(argses[0]))
        )
        labels = np.stack([b.labels for b in chunks])
        predictor = make_packed_predictor(
            fp_hidden_dim=hidden, fp_out_dim=hidden, conv_layers=bench.LAYERS,
            weight_tying=False, sim_method="hole", coo=True, compact=True,
        )
        optimizer = optax.adam(1e-3)
        put = lambda x: jax.device_put(jnp.asarray(x), device)
        stacked_d = tuple(put(a) for a in stacked)
        labels_d = put(labels)
        single = tuple(jnp.asarray(a[0]) for a in stacked)
        variables = predictor.init(jax.random.PRNGKey(0), *single)
        params = jax.device_put(variables["params"], device)
        opt_state = jax.device_put(optimizer.init(params), device)
        scan_fn = make_packed_scan_train_step(
            FusedCompactApply(predictor), optimizer, 1, sigmoid_cross_entropy
        )
        for _ in range(bench.WARMUP):
            params, opt_state, losses = scan_fn(
                params, opt_state, stacked_d, labels_d)
        float(losses[-1])
        t0 = time.time()
        for _ in range(bench.ITERS):
            params, opt_state, losses = scan_fn(
                params, opt_state, stacked_d, labels_d)
        assert float(losses[-1]) == float(losses[-1])  # finite fetch
        dt = (time.time() - t0) / (bench.ITERS * bench.SCAN_STEPS)
    finally:
        fused_ggnn.DEFAULT_BWD_BLOCK_TILES = saved
        fused_ggnn.AGG_KBATCH = saved_kb
        packed_mod.FUSED_READOUT = saved_ro
        fused_ggnn.TWOPASS = saved_tp
    edges = float(np.mean([b.num_edges for b in chunks]))
    emit({
        "config": name, "path": "fused_coo_scan", "hidden": hidden,
        "bwd_k": bwd_k or saved,
        "kbatch": kbatch if kbatch is not None else saved_kb,
        "fused_readout": (fused_ro if fused_ro is not None else saved_ro),
        "step_ms": round(dt * 1e3, 3), "edges_per_s": round(edges / dt),
    })


def run_mpnn_ab(name="mpnn_ab"):
    """PackedMPNN EdgeNet aggregation A/B: round-2 einsum (8 small
    matmuls/layer) vs the round-3 flattened single contraction."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    bench.COMPUTE_DTYPE = None  # f32 A/B regardless of prior configs
    saved_af = packed_mod.EDGENET_AGGFIRST
    packed_mod.EDGENET_AGGFIRST = False
    try:
        for label, flat in (("einsum", False), ("flat", True)):
            packed_mod.EDGENET_FLAT = flat
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_{label}", "path": "packed_mpnn",
                "edgenet": label, "hidden": 32, "dtype": "f32",
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.EDGENET_FLAT = True
        packed_mod.EDGENET_AGGFIRST = saved_af
        bench.COMPUTE_DTYPE = saved_dtype


def run_mpnn_bf16_ab(name="mpnn_bf16"):
    """MPNN f32 vs bf16 compute (VERDICT r3 #7): the EdgeNet adjacency
    contraction is the step's dominant HBM read; bf16 operands halve
    it (exact for the 0/1 adjacency)."""
    import jax.numpy as jnp

    device = jax.devices()[0]
    bench.HIDDEN = 32
    for label, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
        bench.COMPUTE_DTYPE = dtype
        eps, dt, _ = bench.measure_packed_method(device, bench.ITERS, "mpnn")
        emit({
            "config": f"{name}_{label}", "path": "packed_mpnn",
            "dtype": label, "hidden": 32,
            "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
        })
    bench.COMPUTE_DTYPE = None


def run_mpnn_parts(name="mpnn_parts"):
    """MPNN cost attribution 2x2 (VERDICT r3 #7): message
    {edgenet, ggnn} x readout {set2set, ggnn} on the dense packed
    layout.  GGNN's own step is ~7 ms with the same GRU/readout
    machinery, so whichever axis carries the 33 ms MPNN step shows up
    directly."""
    import numpy as np
    import optax

    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch
    from gcnbmp_tpu.models.heads import HEADS
    from gcnbmp_tpu.models.packed import PackedMPNN, PackedPairPredictor
    from gcnbmp_tpu.train.loop import sigmoid_cross_entropy

    device = jax.devices()[0]
    bench.HIDDEN = 32
    ds = bench.build_dataset()
    packed = pack_pair_dataset_batch(ds, list(range(bench.BATCH)))
    put = lambda x: jax.device_put(jnp.asarray(x), device)
    args = (
        put(packed.atom_ids), put(packed.adj), put(packed.mol_id),
        put(packed.node_mask), put(packed.left_index),
        put(packed.right_index),
    )
    y = put(packed.labels)
    for msg in ("edgenet", "ggnn"):
        for ro in ("set2set", "ggnn"):
            predictor = PackedPairPredictor(
                encoder=PackedMPNN(
                    out_dim=32, hidden_dim=32, n_layers=bench.LAYERS,
                    weight_tying=True, message_func=msg, readout_func=ro,
                    name="encoder"),
                head=HEADS["hole"](out_dim=1, hidden_dims=(), name="head"),
            )
            optimizer = optax.adam(1e-3)
            params = jax.device_put(
                predictor.init(jax.random.PRNGKey(0), *args)["params"],
                device)
            opt_state = jax.device_put(optimizer.init(params), device)

            def loss_fn(p):
                logits = predictor.apply({"params": p}, *args)
                return sigmoid_cross_entropy(
                    jnp.reshape(logits, y.shape), y)

            @jax.jit
            def step(p, s):
                l, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = optimizer.update(grads, s, p)
                return optax.apply_updates(p, updates), s, l

            for _ in range(bench.WARMUP):
                params, opt_state, loss = step(params, opt_state)
            float(loss)
            t0 = time.time()
            for _ in range(bench.ITERS):
                params, opt_state, loss = step(params, opt_state)
            assert float(loss) == float(loss)
            dt = (time.time() - t0) / bench.ITERS
            emit({
                "config": f"{name}_{msg}_{ro}", "path": "packed_mpnn",
                "message": msg, "readout": ro, "hidden": 32,
                "layers": bench.LAYERS,
                "step_ms": round(dt * 1e3, 3),
                "edges_per_s": round(float(packed.num_edges) / dt),
            })


def run_mpnn_nmax_ab(name="mpnn_nmax"):
    """Dense-Set2Set atom-table width sensitivity: n_max=64 (safe
    default) gathers ~4.3x more rows than real atoms exist (avg ~15
    atoms/mol); n_max=32 (sufficient for the bench drugs, max 24
    atoms) halves the gather+scatter volume."""
    import optax

    from gcnbmp_tpu.data.packing import pack_pair_dataset_batch
    from gcnbmp_tpu.models.heads import HEADS
    from gcnbmp_tpu.models.packed import PackedMPNN, PackedPairPredictor
    from gcnbmp_tpu.train.loop import sigmoid_cross_entropy

    device = jax.devices()[0]
    bench.HIDDEN = 32
    ds = bench.build_dataset()
    packed = pack_pair_dataset_batch(ds, list(range(bench.BATCH)))
    put = lambda x: jax.device_put(jnp.asarray(x), device)
    args = (
        put(packed.atom_ids), put(packed.adj), put(packed.mol_id),
        put(packed.node_mask), put(packed.left_index),
        put(packed.right_index),
    )
    y = put(packed.labels)
    for n_max in (64, 32):
        predictor = PackedPairPredictor(
            encoder=PackedMPNN(
                out_dim=32, hidden_dim=32, n_layers=bench.LAYERS,
                weight_tying=True, s2s_n_max=n_max,
                compute_dtype=jnp.bfloat16, name="encoder"),
            head=HEADS["hole"](out_dim=1, hidden_dims=(), name="head"),
        )
        optimizer = optax.adam(1e-3)
        params = jax.device_put(
            predictor.init(jax.random.PRNGKey(0), *args)["params"], device)
        opt_state = jax.device_put(optimizer.init(params), device)

        def loss_fn(p):
            logits = predictor.apply({"params": p}, *args)
            return sigmoid_cross_entropy(jnp.reshape(logits, y.shape), y)

        @jax.jit
        def step(p, s):
            l, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = optimizer.update(grads, s, p)
            return optax.apply_updates(p, updates), s, l

        for _ in range(bench.WARMUP):
            params, opt_state, loss = step(params, opt_state)
        float(loss)
        t0 = time.time()
        for _ in range(bench.ITERS):
            params, opt_state, loss = step(params, opt_state)
        assert float(loss) == float(loss)
        dt = (time.time() - t0) / bench.ITERS
        emit({
            "config": f"{name}_{n_max}", "path": "packed_mpnn",
            "s2s_n_max": n_max, "hidden": 32, "dtype": "bf16",
            "step_ms": round(dt * 1e3, 3),
            "edges_per_s": round(float(packed.num_edges) / dt),
        })


def run_mpnn_s2s_ab(name="mpnn_s2s"):
    """Set2Set segment-op vs dense-mode A/B on the full PackedMPNN step
    (round 4: the mpnn_parts 2x2 attributed +17.3 ms of the 33 ms step
    to Set2Set's per-step segment ops/gathers)."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    bench.COMPUTE_DTYPE = None  # f32 A/B regardless of prior configs
    saved = packed_mod.SET2SET_DENSE
    try:
        for label, dense in (("segment", False), ("dense", True)):
            packed_mod.SET2SET_DENSE = dense
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_{label}", "path": "packed_mpnn",
                "set2set": label, "hidden": 32, "dtype": "f32",
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.SET2SET_DENSE = saved
        bench.COMPUTE_DTYPE = saved_dtype


def run_mpnn_ab3(name="mpnn_ab3"):
    """Round-4 EdgeNet A/B (VERDICT r3 #7): r3 'flat' single
    contraction (per-layer hm materialization + adjacency transposes)
    vs the aggregate-first form (no hm tensor; one hoisted transpose
    per forward)."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    bench.COMPUTE_DTYPE = None  # f32 A/B regardless of prior configs
    saved_af = packed_mod.EDGENET_AGGFIRST
    try:
        for label, aggfirst in (("flat", False), ("aggfirst", True)):
            packed_mod.EDGENET_AGGFIRST = aggfirst
            packed_mod.EDGENET_FLAT = True
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_{label}", "path": "packed_mpnn",
                "edgenet": label, "hidden": 32, "dtype": "f32",
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.EDGENET_AGGFIRST = saved_af
        bench.COMPUTE_DTYPE = saved_dtype


def _measure_coattn_step(attn="nie", dtype=None):
    """Packed co-attention train step (the production path every
    co-attention quality row ran on: wire-compact COO +
    PackedCoattnPairPredictor)."""
    import numpy as np
    import optax

    from gcnbmp_tpu.data.packing import (
        max_atoms_lane_rounded,
        pack_pair_dataset_coo,
    )
    from gcnbmp_tpu.models.packed import (
        compact_coattn_arrays,
        make_packed_predictor,
    )
    from gcnbmp_tpu.train.loop import sigmoid_cross_entropy

    device = jax.devices()[0]
    ds = bench.build_dataset()
    b = pack_pair_dataset_coo(ds, list(range(bench.BATCH)))
    n_max = max_atoms_lane_rounded([ds])
    args = tuple(jax.device_put(jnp.asarray(a), device)
                 for a in compact_coattn_arrays(b, n_max))
    y = jax.device_put(jnp.asarray(b.labels), device)
    predictor = make_packed_predictor(
        fp_hidden_dim=bench.HIDDEN, fp_out_dim=bench.HIDDEN,
        conv_layers=bench.LAYERS, weight_tying=False, sim_method="hole",
        attn=attn, compute_dtype=dtype,
    )
    optimizer = optax.adam(1e-3)
    params = jax.device_put(
        predictor.init(jax.random.PRNGKey(0), *args)["params"], device)
    opt_state = jax.device_put(optimizer.init(params), device)

    def loss_fn(p):
        logits = predictor.apply({"params": p}, *args)
        return sigmoid_cross_entropy(jnp.reshape(logits, y.shape), y)

    @jax.jit
    def step(p, s):
        l, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, l

    for _ in range(bench.WARMUP):
        params, opt_state, loss = step(params, opt_state)
    float(loss)
    t0 = time.time()
    for _ in range(bench.ITERS):
        params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))
    dt = (time.time() - t0) / bench.ITERS
    return float(b.num_edges) / dt, dt, float(b.num_edges)


def run_gather_vjp_ab(name="gathervjp"):
    """Gather-only slot-table VJP A/B (ops/slotgather.py): the dense
    Set2Set atom table and the co-attention atom tables backward as a
    pure inverse gather instead of a row-serialized scatter-add.
    Measured on the two production paths that hit it: MPNN (dense
    Set2Set, bf16, fitted n_max) and the co-attention step (nie)."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    saved = packed_mod.GATHER_VJP
    try:
        bench.COMPUTE_DTYPE = jnp.bfloat16
        for label, flag in (("scatter", False), ("gather", True)):
            packed_mod.GATHER_VJP = flag
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_mpnn_{label}", "path": "packed_mpnn",
                "table_vjp": label, "hidden": 32, "dtype": "bf16",
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
        for label, flag in (("scatter", False), ("gather", True)):
            packed_mod.GATHER_VJP = flag
            eps, dt, _ = _measure_coattn_step("nie", jnp.bfloat16)
            emit({
                "config": f"{name}_coattn_{label}", "path": "packed_coattn",
                "table_vjp": label, "attn": "nie", "hidden": 32,
                "dtype": "bf16",
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.GATHER_VJP = saved
        bench.COMPUTE_DTYPE = saved_dtype


def run_molsum_ab(name="molsum"):
    """Scatter-free dense molecule-sum readout A/B
    (models/packed._mol_sum_dense): the readout segment_sum is a 1.23 ms
    standalone scatter-add at B=2048 — the costliest op class left in
    the headline step.  Measured on the headline config (scan bf16
    h=32, one staged batch — where XLA may hoist the searchsorted slot
    build as loop-invariant) AND on coo_scan (distinct stacked batches
    — the honest Trainer-like cost including the per-batch build)."""
    from gcnbmp_tpu.models import packed as packed_mod

    saved = packed_mod.MOL_SUM_DENSE
    saved_nmax = packed_mod._MOL_SUM_NMAX
    try:
        packed_mod._MOL_SUM_NMAX = 32  # bench drugs max 24 atoms
        for label, flag in (("segment", False), ("dense", True)):
            packed_mod.MOL_SUM_DENSE = flag
            run_scan(f"{name}_{label}_scan_bf16_32", 32, jnp.bfloat16)
        for label, flag in (("segment", False), ("dense", True)):
            packed_mod.MOL_SUM_DENSE = flag
            run_coo_scan(f"{name}_{label}_cooscan_bf16_32", 32,
                         jnp.bfloat16)
    finally:
        packed_mod.MOL_SUM_DENSE = saved
        packed_mod._MOL_SUM_NMAX = saved_nmax


def run_onehot_ab(name="onehot"):
    """EmbedAtomID lookup A/B on the headline config (scan bf16 h=32):
    gather+scatter vs one-hot matmul."""
    from gcnbmp_tpu.models import layers

    try:
        for label, flag in (("gather", False), ("onehot", True)):
            layers.ONEHOT_EMBED = flag
            run_scan(f"{name}_{label}_scan_bf16_32", 32, jnp.bfloat16)
    finally:
        layers.ONEHOT_EMBED = False


CONFIGS = {
    "onehot_ab": run_onehot_ab,
    "packed32": lambda: run_packed("packed32", 32, None),
    "bf16_32": lambda: run_packed("bf16_32", 32, jnp.bfloat16),
    "packed64": lambda: run_packed("packed64", 64, None),
    "bf16_64": lambda: run_packed("bf16_64", 64, jnp.bfloat16),
    "packed128": lambda: run_packed("packed128", 128, None),
    "bf16_128": lambda: run_packed("bf16_128", 128, jnp.bfloat16),
    "scan32": lambda: run_scan("scan32", 32, None),
    "scan_bf16_32": lambda: run_scan("scan_bf16_32", 32, jnp.bfloat16),
    # adjacency staged bf16 in HBM (exact for 0/1 bond counts): halves the
    # per-layer re-read of the step's biggest tensor
    "bf16adj_32": lambda: run_packed("bf16adj_32", 32, jnp.bfloat16, True),
    "scan_bf16adj_32": lambda: run_scan("scan_bf16adj_32", 32,
                                        jnp.bfloat16, True),
    "bf16adj_128": lambda: run_packed("bf16adj_128", 128, jnp.bfloat16, True),
    "fused64": lambda: run_fused("fused64", 64),
    "fused128": lambda: run_fused("fused128", 128),
    "fused32": lambda: run_fused("fused32", 32),
    # round-3: backward K-blocking sweep (the r2 VMEM cap was K=4)
    "fused64_k4": lambda: run_fused("fused64_k4", 64, bwd_k=4),
    "fused64_k8": lambda: run_fused("fused64_k8", 64, bwd_k=8),
    "fused64_k16": lambda: run_fused("fused64_k16", 64, bwd_k=16),
    "fused128_k4": lambda: run_fused("fused128_k4", 128, bwd_k=4),
    "fused128_k8": lambda: run_fused("fused128_k8", 128, bwd_k=8),
    "fused128_k16": lambda: run_fused("fused128_k16", 128, bwd_k=16),
    # round-3: the fused+COO+scan production config vs its XLA twin
    "coo_scan64": lambda: run_coo_scan("coo_scan64", 64),
    "coo_scan_bf16_64": lambda: run_coo_scan("coo_scan_bf16_64", 64,
                                             jnp.bfloat16),
    # round-4 re-baseline (VERDICT r3 #1): the bf16 rows above silently
    # ran f32 in round 3 (measure_coo_scan dropped the dtype knob — now
    # fixed in bench.py); re-run against the fused kernel at h=64/128
    "coo_scan128": lambda: run_coo_scan("coo_scan128", 128),
    "coo_scan_bf16_128": lambda: run_coo_scan("coo_scan_bf16_128", 128,
                                              jnp.bfloat16),
    "coo_scan_bf16_32": lambda: run_coo_scan("coo_scan_bf16_32", 32,
                                             jnp.bfloat16),
    "fused_coo_scan64": lambda: run_fused_coo_scan("fused_coo_scan64", 64),
    "fused_coo_scan64_k16": lambda: run_fused_coo_scan(
        "fused_coo_scan64_k16", 64, bwd_k=16),
    "fused_coo_scan32": lambda: run_fused_coo_scan("fused_coo_scan32", 32),
    "fused_coo_scan128": lambda: run_fused_coo_scan("fused_coo_scan128", 128),
    "scan64": lambda: run_scan("scan64", 64, None),
    "scan_bf16_64": lambda: run_scan("scan_bf16_64", 64, jnp.bfloat16),
    # round-4 batch scaling (launch-floor amortization at h=32)
    "scan_bf16_32_b4096": lambda: run_scan_batch(
        "scan_bf16_32_b4096", 32, jnp.bfloat16, 4096),
    "scan_bf16_32_b8192": lambda: run_scan_batch(
        "scan_bf16_32_b8192", 32, jnp.bfloat16, 8192),
    "coo_scan_bf16_32_b4096": lambda: run_coo_scan_batch(
        "coo_scan_bf16_32_b4096", 32, jnp.bfloat16, 4096),
    "coo_scan_bf16_32_b8192": lambda: run_coo_scan_batch(
        "coo_scan_bf16_32_b8192", 32, jnp.bfloat16, 8192),
    "mpnn_ab": run_mpnn_ab,
    "mpnn_ab3": run_mpnn_ab3,
    "mpnn_bf16_ab": run_mpnn_bf16_ab,
    "mpnn_parts": run_mpnn_parts,
    "mpnn_s2s_ab": run_mpnn_s2s_ab,
    "gather_vjp_ab": run_gather_vjp_ab,
    "molsum_ab": run_molsum_ab,
    "mpnn_nmax_ab": run_mpnn_nmax_ab,
    # round-4 fused-kernel K-batched aggregation A/B (VERDICT r3 #5)
    "fused32_kbatch": lambda: run_fused("fused32_kbatch", 32, kbatch=True),
    "fused64_kbatch": lambda: run_fused("fused64_kbatch", 64, kbatch=True),
    "fused128_kbatch": lambda: run_fused("fused128_kbatch", 128,
                                         kbatch=True),
    "fused_coo_scan64_kbatch": lambda: run_fused_coo_scan(
        "fused_coo_scan64_kbatch", 64, kbatch=True),
    "fused_coo_scan32_kbatch": lambda: run_fused_coo_scan(
        "fused_coo_scan32_kbatch", 32, kbatch=True),
    # round-4 kernel-fused gated readout (VERDICT r3 #5b)
    "fused32_ro": lambda: run_fused("fused32_ro", 32, fused_ro=True),
    "fused64_ro": lambda: run_fused("fused64_ro", 64, fused_ro=True),
    "fused32_kbatch_ro": lambda: run_fused(
        "fused32_kbatch_ro", 32, kbatch=True, fused_ro=True),
    "fused64_kbatch_ro": lambda: run_fused(
        "fused64_kbatch_ro", 64, kbatch=True, fused_ro=True),
    "fused_coo_scan32_kbatch_ro": lambda: run_fused_coo_scan(
        "fused_coo_scan32_kbatch_ro", 32, kbatch=True, fused_ro=True),
    "fused_coo_scan64_kbatch_ro": lambda: run_fused_coo_scan(
        "fused_coo_scan64_kbatch_ro", 64, kbatch=True, fused_ro=True),
    "fused_coo_scan64_ro": lambda: run_fused_coo_scan(
        "fused_coo_scan64_ro", 64, fused_ro=True),
    "circ": run_circ,
    # round-5 two-pass backward (VERDICT r4 #1): half-depth backward
    # kernels + HBM h_mid handoff; K sweep past the single-kernel
    # compile ceiling
    "fused_coo_scan32_2p_k4": lambda: run_fused_coo_scan(
        "fused_coo_scan32_2p_k4", 32, bwd_k=4, twopass=True),
    "fused_coo_scan32_2p_k8": lambda: run_fused_coo_scan(
        "fused_coo_scan32_2p_k8", 32, bwd_k=8, twopass=True),
    "fused_coo_scan32_2p_k16": lambda: run_fused_coo_scan(
        "fused_coo_scan32_2p_k16", 32, bwd_k=16, twopass=True),
    "fused_coo_scan64_2p_k4": lambda: run_fused_coo_scan(
        "fused_coo_scan64_2p_k4", 64, bwd_k=4, twopass=True),
    "fused_coo_scan64_2p_k8": lambda: run_fused_coo_scan(
        "fused_coo_scan64_2p_k8", 64, bwd_k=8, twopass=True),
    "fused_coo_scan64_2p_k16": lambda: run_fused_coo_scan(
        "fused_coo_scan64_2p_k16", 64, bwd_k=16, twopass=True),
    "fused_coo_scan128_2p_k8": lambda: run_fused_coo_scan(
        "fused_coo_scan128_2p_k8", 128, bwd_k=8, twopass=True),
    "fused32_2p_k4": lambda: run_fused("fused32_2p_k4", 32, bwd_k=4,
                                       twopass=True),
    "fused32_2p_k8": lambda: run_fused("fused32_2p_k8", 32, bwd_k=8,
                                       twopass=True),
    "fused32_2p_k16": lambda: run_fused("fused32_2p_k16", 32, bwd_k=16,
                                        twopass=True),
    "fused64_2p_k8": lambda: run_fused("fused64_2p_k8", 64, bwd_k=8,
                                       twopass=True),
    "fused64_2p_k16": lambda: run_fused("fused64_2p_k16", 64, bwd_k=16,
                                        twopass=True),
    "fused128_2p_k8": lambda: run_fused("fused128_2p_k8", 128, bwd_k=8,
                                        twopass=True),
    "fused64_2p_k8_mg": lambda: run_fused("fused64_2p_k8_mg", 64, bwd_k=8,
                                          twopass=True, merge_gates=True),
    "fused64_mg": lambda: run_fused("fused64_mg", 64, merge_gates=True),
    # round-5: single-chip co-attention step re-measure (VERDICT r4 #2
    # done-bar: the nie step must not regress from 7.64 ms after the
    # pair-local refactor + the real-valued circular-correlation VJP)
    "coattn_r5": lambda: _run_coattn_r5(),
    "mpnn_s2s_pallas_ab": lambda: run_mpnn_s2s_pallas_ab(),
    "mpnn_dotgen_ab": lambda: run_mpnn_dotgen_ab(),
    "mpnn_fused_ab": lambda: run_mpnn_fused_ab(),
    "coattn_scan": lambda: run_coattn_scan(),
    "fused_coo_scan64_2p_k4": lambda: run_fused_coo_scan(
        "fused_coo_scan64_2p_k4", 64, bwd_k=4, twopass=True),
    "infer_coattn_xla": lambda: run_infer_coattn(
        "infer_coattn_xla", "nie"),
    "infer_coattn_vqa_xla": lambda: run_infer_coattn(
        "infer_coattn_vqa_xla", "vqa"),
    "infer32": lambda: run_infer("infer32", 32, None),
    "infer_bf16_32": lambda: run_infer("infer_bf16_32", 32, jnp.bfloat16),
    "infer_fused32_ro": lambda: run_infer_fused("infer_fused32_ro", 32,
                                                True),
    "infer_fused32": lambda: run_infer_fused("infer_fused32", 32, False),
}

DEFAULT = ["packed32", "bf16_32", "packed64", "bf16_64", "packed128",
           "bf16_128", "scan32", "scan_bf16_32"]


def run_infer_coattn(name, attn="nie"):
    """Forward-only (serving) co-attention throughput at B=2048.

    Round 5 (VERDICT r4 #4): the fused affinity kernel that used to be
    A/B'd here MEASURED SLOWER than the XLA einsum path (4.65 vs
    4.03 ms nie, 4.77 vs 4.02 ms vqa — SWEEPS_r05 infer_coattn rows)
    and was deleted; XLA's fusion of the (B, Nq, Nk) einsum chain is
    already optimal at these shapes."""
    import numpy as np

    from gcnbmp_tpu.data.packing import (
        max_atoms_lane_rounded,
        pack_pair_dataset_coo,
    )
    from gcnbmp_tpu.models.packed import (
        compact_coattn_arrays,
        make_packed_predictor,
    )

    bench.HIDDEN = 32
    device = jax.devices()[0]
    ds = bench.build_dataset()
    b = pack_pair_dataset_coo(ds, list(range(bench.BATCH)))
    n_max = max_atoms_lane_rounded([ds])
    args = tuple(jax.device_put(jnp.asarray(a), device)
                 for a in compact_coattn_arrays(b, n_max))
    predictor = make_packed_predictor(
        fp_hidden_dim=32, fp_out_dim=32, conv_layers=bench.LAYERS,
        weight_tying=False, sim_method="hole", attn=attn,
        compute_dtype=jnp.bfloat16,
    )
    params = jax.device_put(
        predictor.init(jax.random.PRNGKey(0), *args)["params"], device)

    @jax.jit
    def fwd(p, noise):
        p2 = jax.tree.map(lambda x: x * (1.0 + noise), p)
        return predictor.apply({"params": p2}, *args)

    out = fwd(params, jnp.float32(0.0))
    float(jnp.sum(out))
    t0 = time.perf_counter()
    n = 50
    for i in range(n):
        out = fwd(params, jnp.float32(i * 1e-9))
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    emit({
        "config": name, "path": "infer_coattn", "attn": attn,
        "hidden": 32,
        "batch_pairs": bench.BATCH,
        "step_ms": round(dt * 1e3, 3),
        "pairs_per_s": round(bench.BATCH / dt),
    })


def run_mpnn_s2s_pallas_ab(name="mpnn_s2s_pallas"):
    """MPNN step with the fused Pallas Set2Set kernel
    (ops/set2set_kernel.py) vs the XLA dense Set2Set (VERDICT r4 #3:
    target <=15 ms at B=2048, else a recorded negative)."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    saved = packed_mod.SET2SET_PALLAS
    try:
        bench.COMPUTE_DTYPE = jnp.bfloat16
        for label, flag in (("xla", False), ("pallas", True)):
            packed_mod.SET2SET_PALLAS = flag
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_{label}", "path": "packed_mpnn",
                "set2set": label, "hidden": 32, "dtype": "bf16",
                "batch_pairs": bench.BATCH,
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.SET2SET_PALLAS = saved
        bench.COMPUTE_DTYPE = saved_dtype


def run_mpnn_dotgen_ab(name="mpnn_dotgen"):
    """EdgeNet dotgen A/B (round 5): both directed aggregations as
    dot_generals on the RAW (P,4,T,T) adjacency — no (P,2T,4T) ``both``
    copy, HALF the per-layer adjacency bytes — vs the r4 flat form."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    saved = packed_mod.EDGENET_DOTGEN
    try:
        bench.COMPUTE_DTYPE = jnp.bfloat16
        for label, flag in (("flat", False), ("dotgen", True)):
            packed_mod.EDGENET_DOTGEN = flag
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_{label}", "path": "packed_mpnn",
                "edgenet": label, "hidden": 32, "dtype": "bf16",
                "batch_pairs": bench.BATCH,
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.EDGENET_DOTGEN = saved
        bench.COMPUTE_DTYPE = saved_dtype


def run_mpnn_fused_ab(name="mpnn_fused"):
    """Fused multi-layer MPNN kernel A/B (ops/fused_mpnn.py, round 5):
    adjacency + molecule matrix VMEM-resident across all layers vs the
    XLA dotgen path, both with the fused Pallas Set2Set."""
    from gcnbmp_tpu.models import packed as packed_mod

    device = jax.devices()[0]
    bench.HIDDEN = 32
    saved_dtype = bench.COMPUTE_DTYPE
    saved = packed_mod.MPNN_FUSED
    try:
        bench.COMPUTE_DTYPE = jnp.bfloat16
        for label, flag in (("xla", False), ("fused", True)):
            packed_mod.MPNN_FUSED = flag
            eps, dt, _ = bench.measure_packed_method(device, bench.ITERS,
                                                     "mpnn")
            emit({
                "config": f"{name}_{label}", "path": "packed_mpnn",
                "mpnn_kernel": label, "hidden": 32, "dtype": "bf16",
                "batch_pairs": bench.BATCH,
                "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
            })
    finally:
        packed_mod.MPNN_FUSED = saved
        bench.COMPUTE_DTYPE = saved_dtype


def run_coattn_scan(name="coattn_scan", attn="nie"):
    """Co-attention training through SCAN mode (round 5): the r4/r5
    "co-attention step" headlines (8.46/7.64/7.43 ms) were per-dispatch
    measurements — but the coattn machinery itself adds ~0 ms over the
    no-coattn baseline on the same path (decomposition, DESIGN §9e),
    i.e. the cost is the per-dispatch floor scan mode amortizes.  The
    Trainer already wires coattn+scan (coo_args_fn feeds
    scan_chunk_iterator); this measures it."""
    import numpy as np
    import optax

    from gcnbmp_tpu.data import native_pack
    from gcnbmp_tpu.data.packing import (
        max_atoms_lane_rounded,
        pack_pair_dataset_coo,
    )
    from gcnbmp_tpu.models.packed import (
        compact_coattn_arrays,
        make_packed_predictor,
    )
    from gcnbmp_tpu.train.loop import (
        make_packed_scan_train_step,
        sigmoid_cross_entropy,
    )

    bench.HIDDEN = 32
    device = jax.devices()[0]
    ds = bench.build_dataset()
    n_max = max_atoms_lane_rounded([ds])
    rng = np.random.default_rng(1)
    cache = (native_pack.PairDatasetCache(ds)
             if native_pack.native_pack_available() else None)
    chunks = []
    for _ in range(bench.SCAN_STEPS):
        idx = rng.permutation(bench.BATCH).tolist()
        chunks.append(
            native_pack.pack_pairs_native(cache, idx) if cache is not None
            else pack_pair_dataset_coo(ds, idx))
    argses = [compact_coattn_arrays(b, n_max) for b in chunks]
    stacked = tuple(
        np.stack([np.asarray(a[i]) for a in argses])
        for i in range(len(argses[0]))
    )
    labels = np.stack([b.labels for b in chunks])
    predictor = make_packed_predictor(
        fp_hidden_dim=32, fp_out_dim=32, conv_layers=bench.LAYERS,
        weight_tying=False, sim_method="hole", coo=True, compact=True,
        attn=attn, compute_dtype=jnp.bfloat16,
    )
    optimizer = optax.adam(1e-3)
    put = lambda x: jax.device_put(jnp.asarray(x), device)
    stacked_d = tuple(put(a) for a in stacked)
    labels_d = put(labels)
    single = tuple(jnp.asarray(a[0]) for a in stacked)
    params = jax.device_put(
        predictor.init(jax.random.PRNGKey(0), *single)["params"], device)
    opt_state = jax.device_put(optimizer.init(params), device)
    scan_fn = make_packed_scan_train_step(
        predictor, optimizer, 1, sigmoid_cross_entropy)
    for _ in range(bench.WARMUP):
        params, opt_state, losses = scan_fn(
            params, opt_state, stacked_d, labels_d)
    float(losses[-1])
    t0 = time.time()
    for _ in range(bench.ITERS):
        params, opt_state, losses = scan_fn(
            params, opt_state, stacked_d, labels_d)
    assert np.isfinite(float(losses[-1]))
    dt = (time.time() - t0) / (bench.ITERS * bench.SCAN_STEPS)
    edges = float(np.mean([b.num_edges for b in chunks]))
    emit({
        "config": name, "path": "packed_coattn_scan", "attn": attn,
        "hidden": 32, "dtype": "bf16", "batch_pairs": bench.BATCH,
        "scan_steps": bench.SCAN_STEPS,
        "step_ms": round(dt * 1e3, 3),
        "edges_per_s": round(edges / dt),
    })


def _run_coattn_r5():
    saved = bench.COMPUTE_DTYPE
    try:
        bench.COMPUTE_DTYPE = jnp.bfloat16
        bench.HIDDEN = 32
        eps, dt, _ = _measure_coattn_step("nie", jnp.bfloat16)
        emit({
            "config": "coattn_r5", "path": "packed_coattn", "attn": "nie",
            "hidden": 32, "dtype": "bf16", "batch_pairs": bench.BATCH,
            "step_ms": round(dt * 1e3, 3), "edges_per_s": round(eps),
        })
    finally:
        bench.COMPUTE_DTYPE = saved


def main():
    names = sys.argv[1:] or DEFAULT
    for n in names:
        print(f"== {n} ==", flush=True)
        t0 = time.time()
        try:
            CONFIGS[n]()
        except Exception as e:
            emit({"config": n, "error": f"{type(e).__name__}: {e}"[:500]})
        print(f"== {n} done in {time.time() - t0:.0f}s ==", flush=True)


if __name__ == "__main__":
    main()
