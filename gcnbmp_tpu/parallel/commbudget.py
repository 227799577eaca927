"""Analytic per-step communication budget for the edgeshard design.

The ≥80%-at-2+-hosts scaling-efficiency target (BASELINE.json) cannot be
measured on this 1-chip environment, but it CAN be bounded by
construction: the zero-cut-edge tile sharding (parallel/edgeshard.py)
makes ALL message passing device-local, so the per-step cross-device
traffic is exactly

  1. one psum of the per-molecule embedding table g
     (num_mols x out_dim f32) after the local masked segment-sum, and
  2. the gradient all-reduce XLA inserts for the replicated parameters
     (param_count f32), plus two scalar loss psums (negligible).

With ring all-reduce cost 2*(n-1)/n * bytes / bw per device, the
efficiency bound at n devices is

  eff >= t_compute / (t_compute + t_collectives)        (zero overlap)

(XLA in practice overlaps the grad reduction with backward compute, so
the realized efficiency sits between this bound and 1.)

Three deployment scenarios are bounded:
  - ICI: single-slice multi-chip — both collectives ride ICI.
  - DCN: the worst case — both collectives ride the data-center
    network (as if every chip were its own host).
  - multi-host (realistic): the molecule-table psum stays INTRA-slice
    on ICI (it is consumed by the pair-gather on the same slice), and
    only the parameter-gradient reduction crosses hosts on DCN — a
    hierarchical reduce (intra-slice ring + inter-host ring over the
    per-host sum).

The compute-side step time is NOT a constant: it is resolved from the
live benchmark record (``bench.py`` writes ``docs/bench_latest.json``
every run; the driver archives ``BENCH_r*.json`` each round), so the
bound the dryrun prints always reflects the current measured step
(VERDICT r2 weak #6).

Bandwidth constants are single-direction per-chip values in the
public ballpark for TPU v5e (How to Scale Your Model / Cloud docs):
ICI ~4.5e10 B/s per link, DCN ~2.5e10 B/s per host.  They enter only a
ratio whose compute side is ~1000x larger, so the conclusion is robust
to constant error.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from typing import Optional, Tuple

# single-direction bandwidths, bytes/s
ICI_BW = 4.5e10   # v5e ICI, per link
DCN_BW = 2.5e10   # per-host data-center network (200 Gbps)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def resolve_measured_step(
    repo_root: str = _REPO_ROOT,
    expected_hidden: int = 32,
) -> Tuple[Optional[float], Optional[int], str]:
    """Resolve the measured flagship step time (seconds) from the
    freshest benchmark record on disk:

      1. ``docs/bench_latest.json`` — written by every ``bench.py`` run;
      2. the newest ``BENCH_r*.json`` — the driver's per-round archive
         (its ``parsed`` field is bench.py's JSON line).

    Records whose ``hidden`` doesn't match ``expected_hidden`` are
    skipped — a ``GCNBMP_BENCH_HIDDEN=128`` sweep must not masquerade as
    the flagship h=32 step (ADVICE r3 #1).  Returns (step_s,
    batch_pairs, source_label) where ``batch_pairs`` is the batch the
    record was measured at (callers must normalize by it, not assume
    2048); (None, None, reason) when no matching record exists.
    """
    latest = os.path.join(repo_root, "docs", "bench_latest.json")
    if os.path.exists(latest):
        try:
            with open(latest) as f:
                d = json.load(f)
            if ("step_ms" in d
                    and d.get("hidden", expected_hidden) == expected_hidden):
                return d["step_ms"] * 1e-3, d.get("batch_pairs", 2048), \
                    "docs/bench_latest.json"
        except Exception:
            pass
    rounds = sorted(glob.glob(os.path.join(repo_root, "BENCH_r*.json")))
    for path in reversed(rounds):
        try:
            with open(path) as f:
                d = json.load(f)
            parsed = d.get("parsed") or {}
            if ("step_ms" in parsed
                    and parsed.get("hidden",
                                   expected_hidden) == expected_hidden):
                return parsed["step_ms"] * 1e-3, \
                    parsed.get("batch_pairs", 2048), os.path.basename(path)
        except Exception:
            continue
    return None, None, "no matching benchmark record found"


def resolve_measured_coattn_step(
    repo_root: str = _REPO_ROOT,
    expected_hidden: int = 32,
) -> Tuple[Optional[float], Optional[int], str]:
    """Resolve the measured CO-ATTENTION step time (seconds) from the
    newest ``docs/SWEEPS_r*.jsonl`` row with ``path == "packed_coattn"``
    (the wire-compact nie step all 15 variant quality rows ran on).
    VERDICT r4 weak #2: the co-attention comm bound must divide by the
    co-attention step's OWN compute, not the flagship's."""
    sweeps = sorted(glob.glob(os.path.join(repo_root, "docs",
                                           "SWEEPS_r*.jsonl")))
    for path in reversed(sweeps):
        best = None
        try:
            with open(path) as f:
                for line in f:
                    try:
                        row = json.loads(line)
                    except ValueError:
                        continue
                    if (row.get("path") == "packed_coattn"
                            and "step_ms" in row
                            and row.get("hidden",
                                        expected_hidden) == expected_hidden
                            and row.get("attn", "nie") == "nie"):
                        best = row
        except OSError:
            continue
        if best is not None:
            return best["step_ms"] * 1e-3, best.get("batch_pairs", 2048), \
                os.path.basename(path)
    return None, None, "no packed_coattn sweep record found"


def ring_all_reduce_s(bytes_per_device: float, n: int, bw: float) -> float:
    """Ring all-reduce wall time: each device sends/receives
    2*(n-1)/n of the buffer at ``bw`` bytes/s."""
    if n <= 1:
        return 0.0
    return 2.0 * (n - 1) / n * bytes_per_device / bw


def ring_all_gather_s(total_bytes: float, n: int, bw: float) -> float:
    """Ring all-gather wall time: each device receives (n-1)/n of the
    gathered buffer at ``bw`` bytes/s (half an all-reduce)."""
    if n <= 1:
        return 0.0
    return (n - 1) / n * total_bytes / bw


@dataclass
class CommBudget:
    batch_pairs: int
    n_devices: int
    n_hosts: int
    param_count: int
    moltable_bytes: float      # psum payload (num_mols x out_dim f32)
    grad_bytes: float          # gradient all-reduce payload
    compute_s: float           # per-step compute at this batch
    step_source: str           # where the measured step time came from
    collective_s_ici: float    # both collectives on ICI
    collective_s_dcn: float    # both collectives on DCN (worst case)
    collective_s_mh: float     # psum on ICI intra-slice, grads on DCN
    efficiency_bound_ici: float
    efficiency_bound_dcn: float
    efficiency_bound_multihost: float

    def row(self) -> str:
        return (
            f"B={self.batch_pairs:<6d} n={self.n_devices:<3d} "
            f"psum {self.moltable_bytes / 1e6:6.2f} MB + grads "
            f"{self.grad_bytes / 1e6:6.2f} MB | compute {self.compute_s * 1e3:7.2f} ms "
            f"| coll ICI {self.collective_s_ici * 1e6:8.1f} us "
            f"DCN {self.collective_s_dcn * 1e6:8.1f} us "
            f"mh {self.collective_s_mh * 1e6:8.1f} us "
            f"| eff >= {self.efficiency_bound_ici * 100:.2f}% (ICI) / "
            f"{self.efficiency_bound_dcn * 100:.2f}% (DCN) / "
            f"{self.efficiency_bound_multihost * 100:.2f}% "
            f"({self.n_hosts}-host)"
        )


def edgeshard_comm_budget(
    batch_pairs: int,
    param_count: int,
    out_dim: int = 32,
    n_devices: int = 8,
    n_hosts: int = 2,
    step_s_b2048: Optional[float] = None,
    ici_bw: float = ICI_BW,
    dcn_bw: float = DCN_BW,
    measured_batch_pairs: int = 2048,
) -> CommBudget:
    """Budget for one edgeshard train step at ``batch_pairs`` pairs.

    ``step_s_b2048``: measured per-step wall time on one chip, taken at
    ``measured_batch_pairs`` pairs.  When None both are resolved from
    the live benchmark record on disk (resolve_measured_step, flagship
    h=32 records only).  Compute time scales linearly from that step
    (the step is edge-count-proportional) and is divided across
    devices; the collective payloads are not (the molecule table and
    gradients are global)."""
    source = "explicit"
    if step_s_b2048 is None:
        step_s_b2048, rec_b, source = resolve_measured_step()
        if step_s_b2048 is None:
            raise RuntimeError(
                "no measured step time available: run `python bench.py` "
                "once (writes docs/bench_latest.json) or pass "
                "step_s_b2048 explicitly"
            )
        measured_batch_pairs = rec_b or measured_batch_pairs
    num_mols = 2 * batch_pairs
    moltable = num_mols * out_dim * 4.0
    grads = param_count * 4.0
    compute = (step_s_b2048 * (batch_pairs / float(measured_batch_pairs))
               / n_devices)
    coll_ici = (ring_all_reduce_s(moltable, n_devices, ici_bw)
                + ring_all_reduce_s(grads, n_devices, ici_bw))
    coll_dcn = (ring_all_reduce_s(moltable, n_devices, dcn_bw)
                + ring_all_reduce_s(grads, n_devices, dcn_bw))
    # realistic multi-host split: the molecule table is consumed on the
    # slice that produced it (psum over the n_local intra-slice devices,
    # ICI); gradients reduce hierarchically — intra-slice ring on ICI,
    # then an inter-host ring over the per-host partial sums on DCN
    n_local = max(1, n_devices // max(1, n_hosts))
    coll_mh = (ring_all_reduce_s(moltable, n_local, ici_bw)
               + ring_all_reduce_s(grads, n_local, ici_bw)
               + ring_all_reduce_s(grads, n_hosts, dcn_bw))
    return CommBudget(
        batch_pairs=batch_pairs,
        n_devices=n_devices,
        n_hosts=n_hosts,
        param_count=param_count,
        moltable_bytes=moltable,
        grad_bytes=grads,
        compute_s=compute,
        step_source=source,
        collective_s_ici=coll_ici,
        collective_s_dcn=coll_dcn,
        collective_s_mh=coll_mh,
        efficiency_bound_ici=compute / (compute + coll_ici),
        efficiency_bound_dcn=compute / (compute + coll_dcn),
        efficiency_bound_multihost=compute / (compute + coll_mh),
    )


def print_comm_budget_table(param_count: int, out_dim: int = 32,
                            n_devices: int = 8, n_hosts: int = 2,
                            hidden_dim: "int | None" = None) -> list:
    """The dryrun_multichip tail: per-step collective volume and the
    derived scaling-efficiency bound at B=2048/8192 (VERDICT r1 #5),
    computed from the live measured step time (VERDICT r2 weak #6).
    Also prints the co-attention bounds (pair-local default + legacy
    all_gather), computed against the co-attention step's OWN measured
    compute; they are appended to each returned CommBudget as
    ``.coattn_effs`` (dict) for the dryrun's >=80% assertion."""
    rows = []
    step_s, rec_b, source = resolve_measured_step()
    print("comm budget (edgeshard, zero-cut-edge tile sharding; "
          f"params={param_count:,}; step time from {source}"
          + (f" @ B={rec_b}" if rec_b else "") + "):")
    for b in (2048, 8192):
        budget = edgeshard_comm_budget(
            b, param_count, out_dim=out_dim, n_devices=n_devices,
            n_hosts=n_hosts, step_s_b2048=step_s,
            measured_batch_pairs=rec_b or 2048,
        )
        rows.append(budget)
        print("  " + budget.row())
        # co-attention budgets, against the co-attention step's OWN
        # measured compute (VERDICT r4 weak #2).  Round 5 default: the
        # pair-local packer (pack_pair_dataset_coo_pairlocal) places
        # both molecules of every pair on one device, so the atom-table
        # all_gather AND the molecule-table psum are GONE — the only
        # collective left is the gradient all-reduce.  The legacy
        # all_gather path is bounded alongside for comparison.
        ca_step_s, ca_b, ca_src = resolve_measured_coattn_step()
        if ca_step_s is None:
            continue
        ca_compute = ca_step_s * (b / float(ca_b)) / n_devices
        grads_ici = ring_all_reduce_s(budget.grad_bytes, n_devices, ICI_BW)
        eff_pl = ca_compute / (ca_compute + grads_ici)
        # legacy path payloads: the full (P*T, H) node table all_gather
        # (measured pack density ~14.6 atoms/mol at 0.98 tile occupancy;
        # width = the ENCODER hidden dim, == out_dim for the flagship)
        # plus the molecule-table psum
        p_tiles = 2 * b * 14.6 / (128.0 * 0.98)
        ag_bytes = p_tiles * 128 * (hidden_dim or out_dim) * 4.0
        ag_ici = ring_all_gather_s(ag_bytes, n_devices, ICI_BW)
        eff_legacy = ca_compute / (
            ca_compute + budget.collective_s_ici + ag_ici)
        print(f"    +coattn pair-local (default): grads-only collective "
              f"-> eff >= {eff_pl * 100:.2f}% (ICI; coattn step from "
              f"{ca_src} @ B={ca_b})")
        print(f"    +coattn legacy all_gather {ag_bytes / 1e6:6.2f} MB "
              f"-> ICI {ag_ici * 1e6:8.1f} us | eff >= "
              f"{eff_legacy * 100:.2f}% (ICI, own-compute bound)")
        budget.coattn_effs = {"pair_local": eff_pl, "legacy": eff_legacy}
    return rows
