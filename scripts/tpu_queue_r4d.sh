#!/bin/bash
# Round-4 TPU queue, part D (v2): waits for part C, then measures the
# kernel-fused gated readout (VERDICT r3 #5b) on hardware and its VJP
# parity.  The AGG_KBATCH combos were dropped after the part-B A/B
# showed Mosaic rejects that layout at h=32/64 and it is slower at
# h=128 (SWEEPS_r04 *_kbatch rows) — measured dead end.
set -uo pipefail
cd /root/repo

echo "== waiting for r4c queue"
while ! grep -q R4C_QUEUE_DONE logs/tpu_queue_r4c.log 2>/dev/null; do
  sleep 60
done
echo "== r4c done; starting r4d $(date +%T)"

python scripts/tpu_sweep.py fused32_ro fused64_ro fused_coo_scan64_ro \
  >> logs/sweep_r4.log 2>&1 || echo "== fused-ro sweep FAILED"
echo "== fused-ro sweep done $(date +%T)"

# MPNN bf16 A/B (the remaining VERDICT r3 #7 lever after aggfirst
# measured slower): adjacency + message contractions in bf16
python scripts/tpu_sweep.py mpnn_bf16_ab \
  >> logs/sweep_r4.log 2>&1 || echo "== mpnn bf16 FAILED"
echo "== mpnn bf16 done $(date +%T)"

GCNBMP_FUSED_READOUT=1 timeout 1200 python bench.py \
  --verify >> logs/verify_r4_ro.log 2>&1 || echo "== ro verify FAILED"
echo "== ro verify done $(date +%T)"

timeout 900 python bench.py >> logs/bench_r4_final2.log 2>&1 \
  || echo "== final bench FAILED"
echo R4D_QUEUE_DONE
