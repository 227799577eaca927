#!/bin/bash
# Round-4 TPU queue, part C: waits for part B, then
#  1. MPNN full-scale quality row re-run on the aggregate-first EdgeNet
#     (VERDICT r3 #7 "Done" criterion)
#  2. XLA h=64 bf16+scan seeds 1-2 — the symmetric seed band for the
#     fused-vs-XLA quality comparison (VERDICT r3 #6)
#  3. per-stage profile refresh (PROFILE_r04) on the final h=32 step
#  4. sustained re-measure with the winning knobs + final bench
set -uo pipefail
cd /root/repo

echo "== waiting for r4b queue"
while ! grep -q R4B_QUEUE_DONE logs/tpu_queue_r4b.log 2>/dev/null; do
  sleep 60
done
echo "== r4b done; starting r4c $(date +%T)"

ISC=dataset/synth546/inter/isc35000_train.csv
VAL=dataset/synth546/inter/ddi_inter_valid.csv
TEST=dataset/synth546/inter/ddi_inter_test.csv

train_eval () {  # train_eval OUTDIR [extra args...]
  local out=$1; shift
  if [ -f "results/$out/eval/eval_result.json" ]; then
    echo "== $out already done, skipping"; return 0
  fi
  echo "== $out start $(date +%T)"
  python train.py --train $ISC --val $VAL \
    --batch-size 2048 --lr 2e-3 --no-eval-train --out "results/$out" "$@" \
    || { echo "== $out TRAIN FAILED"; return 0; }
  python eval.py --test $TEST --run "results/$out" --checkpoint best \
    --out "results/$out/eval" \
    || echo "== $out EVAL FAILED"
  echo "== $out done $(date +%T)"
}

# 1. MPNN on the aggregate-first EdgeNet (same protocol as the r3 row)
train_eval ref_scale_mpnn_full_r4 \
  --method mpnn --sim-method hole --conv-layers 4 --weight-tying true \
  --fp-hidden-dim 32 --fp-out-dim 32 \
  --compute-path coo --epochs 40 --patience 10 --augment --seed 0

# 2. XLA h=64 bf16+scan seeds (twin config of the fused64 rows)
for SEED in 1 2; do
  train_eval ref_scale_h64_s$SEED \
    --method ggnn --conv-layers 8 --fp-hidden-dim 64 --fp-out-dim 64 \
    --weight-tying false --compute-path coo --compute-dtype bfloat16 \
    --scan-steps 10 --epochs 80 --patience 10 --augment --seed $SEED
done

# 3. per-stage profile refresh on the final step
python scripts/profile_stages.py >> logs/profile_r4.log 2>&1 \
  || echo "== profiler FAILED"
echo "== profiler done $(date +%T)"

# 4. final sustained (best knobs) + headline bench refresh
GCNBMP_BENCH_BF16=1 GCNBMP_SUSTAINED_REUSE=1 timeout 900 python bench.py \
  --sustained >> logs/sustained_r4_final.log 2>&1 \
  || echo "== sustained final FAILED"
timeout 900 python bench.py >> logs/bench_r4_final.log 2>&1 \
  || echo "== final bench FAILED"
echo R4C_QUEUE_DONE
