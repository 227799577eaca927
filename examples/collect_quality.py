#!/usr/bin/env python
"""Aggregate quality evidence: for every run directory under results/
with an eval_result.json, collect test metrics + training wall/epochs
into docs/quality_results.json (the committed evidence behind
docs/QUALITY.md — results/ itself is gitignored), embed the run's
config + seed, and snapshot the small per-row artifacts
(eval_result.json + config.json) into TRACKED docs/results/<row>/ so
every QUALITY.md row resolves in a fresh clone (VERDICT r4 weak #5)."""

from __future__ import annotations

import json
import os
import shutil
import sys

RESULTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "results")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "quality_results.json")


def main():
    # merge into the committed evidence file: results/ is gitignored and
    # per-round, so prior rounds' entries must survive a partial rerun
    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    for name in sorted(os.listdir(RESULTS)):
        run = os.path.join(RESULTS, name)
        found = None
        for sub in ("eval", "eval_full"):
            p = os.path.join(run, sub, "eval_result.json")
            if os.path.exists(p):
                found = p
                break
        if found is None:
            continue
        with open(found) as f:
            metrics = json.load(f)
        entry = {k: v for k, v in metrics.items() if k != "per_class"}
        if "per_class" in metrics:
            entry["n_classes"] = len(metrics["per_class"])
        log_path = os.path.join(run, "log.json")
        if os.path.exists(log_path):
            with open(log_path) as f:
                log = json.load(f)
            if log:
                entry["epochs"] = len(log)
                entry["train_wall_s"] = round(log[-1]["elapsed_time"], 1)
                vals = [e["val/loss"] for e in log if "val/loss" in e]
                if vals:
                    entry["best_val_loss"] = round(min(vals), 5)
        cfg_path = os.path.join(run, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                cfg = json.load(f)
            entry["config"] = cfg
            entry["seed"] = cfg.get("seed")
        # snapshot the small artifacts into the tracked tree
        snap = os.path.join(os.path.dirname(OUT), "results", name)
        os.makedirs(snap, exist_ok=True)
        shutil.copy(found, os.path.join(snap, "eval_result.json"))
        if os.path.exists(cfg_path):
            shutil.copy(cfg_path, os.path.join(snap, "config.json"))
        entry["artifact"] = f"docs/results/{name}/eval_result.json"
        out[name] = entry
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {OUT}: {len(out)} runs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
