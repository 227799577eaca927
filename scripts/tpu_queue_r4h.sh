#!/bin/bash
# Round-4 TPU queue, part H (v2): waits for part G, then
#  1. re-measure the kernel-fused readout sweep with the (P, T, 1)
#     mask layout fix (first attempt broke the TPU lowering's (8, 128)
#     block rule on the backward's K=4 mask blocks)
#  2. MPNN cost-attribution 2x2 (message x readout) — the aggfirst and
#     bf16 levers both measured neutral, so attribute the 33 ms first
set -uo pipefail
cd /root/repo

echo "== waiting for r4g queue"
while ! grep -q R4G_QUEUE_DONE logs/tpu_queue_r4g.log 2>/dev/null; do
  sleep 60
done
echo "== r4g done; starting r4h $(date +%T)"

python scripts/tpu_sweep.py fused32_ro fused64_ro fused_coo_scan64_ro \
  >> logs/sweep_r4.log 2>&1 || echo "== fused-ro retry FAILED"
echo "== fused-ro retry done $(date +%T)"

python scripts/tpu_sweep.py mpnn_parts \
  >> logs/sweep_r4.log 2>&1 || echo "== mpnn_parts FAILED"
echo "== mpnn_parts done $(date +%T)"
echo R4H_QUEUE_DONE
