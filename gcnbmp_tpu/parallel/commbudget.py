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

Bandwidth constants are single-direction per-chip values in the
public ballpark for TPU v5e (How to Scale Your Model / Cloud docs):
ICI ~4.5e10 B/s per link, DCN ~2.5e10 B/s per host.  They enter only a
ratio whose compute side is ~1000x larger, so the conclusion is robust
to constant error.
"""

from __future__ import annotations

from dataclasses import dataclass

# single-direction bandwidths, bytes/s
ICI_BW = 4.5e10   # v5e ICI, per link
DCN_BW = 2.5e10   # per-host data-center network (200 Gbps)

# measured flagship step time on the real v5e (bench.py scan mode,
# B=2048 pairs, GGNN 8 layers h=32 untied + HolE, fwd+bwd+adam)
MEASURED_STEP_S_B2048 = 5.8e-3


def ring_all_reduce_s(bytes_per_device: float, n: int, bw: float) -> float:
    """Ring all-reduce wall time: each device sends/receives
    2*(n-1)/n of the buffer at ``bw`` bytes/s."""
    if n <= 1:
        return 0.0
    return 2.0 * (n - 1) / n * bytes_per_device / bw


@dataclass
class CommBudget:
    batch_pairs: int
    n_devices: int
    param_count: int
    moltable_bytes: float      # psum payload (num_mols x out_dim f32)
    grad_bytes: float          # gradient all-reduce payload
    compute_s: float           # per-step compute at this batch
    collective_s_ici: float    # both collectives on ICI
    collective_s_dcn: float    # both collectives on DCN (multi-host worst case)
    efficiency_bound_ici: float
    efficiency_bound_dcn: float

    def row(self) -> str:
        return (
            f"B={self.batch_pairs:<6d} n={self.n_devices:<3d} "
            f"psum {self.moltable_bytes / 1e6:6.2f} MB + grads "
            f"{self.grad_bytes / 1e6:6.2f} MB | compute {self.compute_s * 1e3:7.2f} ms "
            f"| coll ICI {self.collective_s_ici * 1e6:8.1f} us "
            f"DCN {self.collective_s_dcn * 1e6:8.1f} us "
            f"| eff >= {self.efficiency_bound_ici * 100:.2f}% (ICI) / "
            f"{self.efficiency_bound_dcn * 100:.2f}% (DCN)"
        )


def edgeshard_comm_budget(
    batch_pairs: int,
    param_count: int,
    out_dim: int = 32,
    n_devices: int = 8,
    step_s_b2048: float = MEASURED_STEP_S_B2048,
    ici_bw: float = ICI_BW,
    dcn_bw: float = DCN_BW,
) -> CommBudget:
    """Budget for one edgeshard train step at ``batch_pairs`` pairs.

    Compute time scales linearly from the measured B=2048 step (the step
    is edge-count-proportional; bench.py's measured rate).  The compute
    side is divided across devices; the collective payloads are not (the
    molecule table and gradients are global)."""
    num_mols = 2 * batch_pairs
    moltable = num_mols * out_dim * 4.0
    grads = param_count * 4.0
    compute = step_s_b2048 * (batch_pairs / 2048.0) / n_devices
    coll_ici = (ring_all_reduce_s(moltable, n_devices, ici_bw)
                + ring_all_reduce_s(grads, n_devices, ici_bw))
    coll_dcn = (ring_all_reduce_s(moltable, n_devices, dcn_bw)
                + ring_all_reduce_s(grads, n_devices, dcn_bw))
    return CommBudget(
        batch_pairs=batch_pairs,
        n_devices=n_devices,
        param_count=param_count,
        moltable_bytes=moltable,
        grad_bytes=grads,
        compute_s=compute,
        collective_s_ici=coll_ici,
        collective_s_dcn=coll_dcn,
        efficiency_bound_ici=compute / (compute + coll_ici),
        efficiency_bound_dcn=compute / (compute + coll_dcn),
    )


def print_comm_budget_table(param_count: int, out_dim: int = 32,
                            n_devices: int = 8) -> list:
    """The dryrun_multichip tail: per-step collective volume and the
    derived scaling-efficiency bound at B=2048/8192 (VERDICT r1 #5)."""
    rows = []
    print("comm budget (edgeshard, zero-cut-edge tile sharding; "
          f"params={param_count:,}):")
    for b in (2048, 8192):
        budget = edgeshard_comm_budget(
            b, param_count, out_dim=out_dim, n_devices=n_devices
        )
        rows.append(budget)
        print("  " + budget.row())
    return rows
