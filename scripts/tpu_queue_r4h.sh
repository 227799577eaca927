#!/bin/bash
# Round-4 TPU queue, part H: waits for part G, then re-measures the
# kernel-fused readout sweep with the (P, T, 1) mask layout fix (the
# first attempt hit the TPU lowering's (8, 128) block divisibility
# rule on the backward's K=4 mask blocks).
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
echo R4H_QUEUE_DONE
