#!/bin/bash
# Round-4 TPU queue, part G (final): waits for part F, then
#  1. clean re-measure of the reuse-packs sustained pipeline (both
#     prior attempts landed in degraded-relay windows: serialized
#     transfer 11 s/batch vs 142 ms in the clean baseline window —
#     logs/sustained_r4_{reuse,final}.log)
#  2. per-stage profiler re-run (the 08:22 run hit the same window:
#     full_step 21 ms vs the 4.1 ms bench seconds later)
#  3. final headline bench
set -uo pipefail
cd /root/repo

echo "== waiting for r4f queue"
while ! grep -q R4F_QUEUE_DONE logs/tpu_queue_r4f.log 2>/dev/null; do
  sleep 60
done
echo "== r4f done; starting r4g $(date +%T)"

GCNBMP_BENCH_BF16=1 GCNBMP_SUSTAINED_REUSE=1 timeout 900 python bench.py \
  --sustained >> logs/sustained_r4_reuse2.log 2>&1 \
  || echo "== sustained reuse2 FAILED"
grep "sustained:" logs/sustained_r4_reuse2.log | tail -12
echo "== sustained reuse2 done $(date +%T)"

python scripts/profile_stages.py >> logs/profile_r4b.log 2>&1 \
  || echo "== profiler re-run FAILED"
echo "== profiler re-run done $(date +%T)"

timeout 900 python bench.py >> logs/bench_r4_final3.log 2>&1 \
  || echo "== final bench FAILED"
echo R4G_QUEUE_DONE
