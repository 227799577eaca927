#!/bin/bash
# Round-5 TPU queue C (waits for B): EdgeNet dotgen A/B — the round-5
# MPNN lever (halve the per-layer adjacency bytes by contracting the
# raw layout) measured on the production config (bf16 + fused Pallas
# Set2Set auto-on).
set -uo pipefail
cd /root/repo
mkdir -p logs

echo "== waiting for r5b queue"
while ! grep -q R5B_QUEUE_DONE logs/tpu_queue_r5b.log 2>/dev/null; do
  sleep 60
done
echo "== r5b done; starting r5c $(date +%T)"

python scripts/tpu_sweep.py mpnn_dotgen_ab \
  >> logs/sweep_r5.log 2>&1 || echo "== mpnn_dotgen FAILED"
echo "== mpnn_dotgen done $(date +%T)"
echo R5C_QUEUE_DONE
