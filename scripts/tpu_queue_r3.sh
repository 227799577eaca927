#!/bin/bash
# Round-3 TPU work queue: runs after the co-attention battery frees the
# chip.  Order: de-risk sweeps (fused K on hardware) -> quality battery
# -> full sweeps -> stage profiler -> sustained + verify.
set -uo pipefail
cd /root/repo

echo "== waiting for coattn battery to finish"
while ! grep -q COATTN_BATTERY_DONE logs/coattn_battery_r3.log 2>/dev/null; do
  sleep 60
done
echo "== coattn battery done; starting r3 queue $(date +%T)"

# 1. de-risk: fused backward K on hardware + the fused+COO+scan path
python scripts/tpu_sweep.py fused64_k4 fused64_k8 fused64_k16 \
  fused_coo_scan64 coo_scan64 \
  >> logs/sweep_r3.log 2>&1 || echo "== sweep batch 1 FAILED"
echo "== sweep batch 1 done $(date +%T)"

# 2. quality battery (the long pole)
bash scripts/quality_battery_r3.sh >> logs/quality_battery_r3.log 2>&1
echo "== quality battery done $(date +%T)"

# 3. remaining sweeps (trimmed to fit the round budget)
python scripts/tpu_sweep.py fused32 fused128_k8 fused_coo_scan32 \
  coo_scan_bf16_64 mpnn_ab \
  >> logs/sweep_r3.log 2>&1 || echo "== sweep batch 2 FAILED"
GCNBMP_FUSED_BF16=1 python scripts/tpu_sweep.py fused_coo_scan32 \
  fused_coo_scan64 \
  >> logs/sweep_r3.log 2>&1 || echo "== sweep bf16 FAILED"
echo "== sweeps done $(date +%T)"

# 4. stage profiler (VERDICT #2)
python scripts/profile_stages.py >> logs/profile_r3.log 2>&1 \
  || echo "== profiler FAILED"
echo "== profiler done $(date +%T)"

# 5. sustained decomposition + hardware verify (VERDICT #8/#9)
python bench.py --sustained >> logs/sustained_r3.log 2>&1 \
  || echo "== sustained FAILED"
python bench.py --verify >> logs/verify_r3.log 2>&1 \
  || echo "== verify FAILED"
echo TPU_QUEUE_R3_DONE
