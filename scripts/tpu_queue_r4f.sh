#!/bin/bash
# Round-4 TPU queue, part F: waits for part E, then the batch-scaling
# probe — the h=32 step is launch-count-bound (PROFILE_r03/r04), and
# edges/s amortizes the fixed launch floor over batch size.
set -uo pipefail
cd /root/repo

echo "== waiting for r4e queue"
while ! grep -q R4E_QUEUE_DONE logs/tpu_queue_r4e.log 2>/dev/null; do
  sleep 60
done
echo "== r4e done; starting r4f $(date +%T)"

python scripts/tpu_sweep.py scan_bf16_32_b4096 scan_bf16_32_b8192 \
  coo_scan_bf16_32_b4096 \
  >> logs/sweep_r4.log 2>&1 || echo "== batch sweep FAILED"
echo "== batch sweep done $(date +%T)"
echo R4F_QUEUE_DONE
