#!/usr/bin/env python
"""One-time provenance backfill for docs/quality_results.json
(VERDICT r4 weak #5: rows lacked per-row config/seed metadata and the
gitignored results/ dirs did not survive the round snapshot).

Every legacy quality row was produced by a committed battery script;
this scans scripts/*.sh + examples/*.sh for the exact train command
that wrote each ``results/<name>`` run dir and attaches it to the
record as ``provenance`` = {script, command}.  Rows produced from
round 5 on get full config+seed embedded at collection time instead
(examples/collect_quality.py).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "docs", "quality_results.json")


def commands_by_name():
    """Map results/<name> -> (script, command text)."""
    found = {}
    for path in sorted(glob.glob(os.path.join(REPO, "scripts", "*.sh"))
                       + glob.glob(os.path.join(REPO, "examples", "*.sh"))):
        with open(path) as f:
            text = f.read()
        rel = os.path.relpath(path, REPO)
        # (a) explicit python train.py blocks with --out results/NAME
        for m in re.finditer(
            r"(python train\.py(?:[^\n]|\\\n)*?--out\s+\"?results/"
            r"([A-Za-z0-9_./-]+)\"?(?:[^\n]|\\\n)*)", text,
        ):
            cmd = re.sub(r"\\\n\s*", " ", m.group(1)).strip()
            found.setdefault(m.group(2).split("/")[0], (rel, cmd))
        # (b) train_eval helper invocations: the helper pins
        # h=32 bs=2048 lr=2e-3 seed=0 (see the script body)
        for m in re.finditer(
            r"^(train_eval\s+([A-Za-z0-9_./-]+)(?:[^\n]|\\\n)*)",
            text, re.M,
        ):
            cmd = re.sub(r"\\\n\s*", " ", m.group(1)).strip()
            found.setdefault(
                m.group(2).split("/")[0],
                (rel, cmd + "   # helper pins: h=32 bs=2048 lr=2e-3 "
                             "--no-eval-train --seed 0"))
        # (c) `run NAME extra...` helper invocations (the ref-scale and
        # co-attention batteries): resolve against the helper's base
        # python train.py command in the same script
        helper = re.search(
            r"run \(\) \{[^\n]*\n(?:.*\n)*?\s*(python train\.py"
            r"(?:[^\n]|\\\n)*?--out\s+\"results/\$out\"[^\n]*)", text)
        if helper:
            base = re.sub(r"\\\n\s*", " ", helper.group(1)).strip()
            base = base.rstrip('"$@" ').strip()
            for m in re.finditer(
                r"^run\s+([A-Za-z0-9_./-]+)\s*([^\n#]*)(#[^\n]*)?$",
                text, re.M,
            ):
                name2, extra, comment = m.groups()
                cmd = (base + " " + extra.strip()
                       + (("   " + comment.strip()) if comment else ""))
                found.setdefault(name2.split("/")[0], (rel, cmd))
    return found


# rows whose producing commands are not mechanically recoverable from a
# committed script (older-round one-offs / analysis artifacts); the
# notes pin config + provenance by hand from docs/QUALITY.md context
MANUAL = {
    "ref_scale_gwm": "round-1 dense-packed GWM (method=ggnn-gwm, "
        "sim=hole, conv=4, h=32, padded path, isc35000, seed 0) — "
        "SUPERSEDED by ref_scale_gwm_cooscan (production COO/scan path)",
    "ref_scale_drugsplit": "examples/ref_scale_battery.sh run2 helper: "
        "flagship flags (ggnn, conv 8, h=32, hole, coo, bs 2048, lr 2e-3, "
        "augment, seed 0) on dataset/synth546/drug ddi_drug_* split",
    "ref_scale_scafsplit": "examples/ref_scale_battery.sh run2 helper: "
        "flagship flags on dataset/synth546/scaffold ddi_scaffold_* split",
    "fused_h64_e2e": "round-3 fused+COO+scan h=64 end-to-end smoke "
        "(same flags as ref_scale_fused64, shorter budget, seed 0)",
    "ref_scale_h64_bf16": "XLA h=64 bf16+scan twin of the fused64 row "
        "(same flags as the r4c ref_scale_h64_s{1,2} block, seed 0)",
    "ref_scale_baselines.json": "classical-ML baselines table "
        "(gcnbmp_tpu/eval/baselines.py over the flagship run's exported "
        "embeddings + ecfp4/mol2vec features; not a train run)",
    "correlation.json": "embedding-similarity vs known-DDI correlation "
        "(gcnbmp_tpu/eval/analysis.py over the flagship run; not a "
        "train run)",
}


def main():
    with open(OUT) as f:
        records = json.load(f)
    cmds = commands_by_name()
    hit = miss = 0
    for name, rec in records.items():
        if "config" in rec or "provenance" in rec:
            continue
        base = name.split("/")[0]
        if base in cmds:
            script, cmd = cmds[base]
            rec["provenance"] = {"script": script, "command": cmd}
            hit += 1
        elif name in MANUAL:
            rec["provenance"] = {"note": MANUAL[name]}
            hit += 1
        else:
            miss += 1
    with open(OUT, "w") as f:
        json.dump(records, f, indent=2)
    print(f"backfilled {hit} records; {miss} without a matching command")
    return 0


if __name__ == "__main__":
    sys.exit(main())
