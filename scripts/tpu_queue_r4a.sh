#!/bin/bash
# Round-4 TPU queue, part A (VERDICT r3 #1/#5/#6):
#  1. re-baseline the fused-kernel claim with the CORRECTED bf16 plumbing
#     (round-3's coo_scan_bf16_* rows silently ran f32): XLA COO+scan
#     f32+bf16 at h=64/128(+32) vs fused+COO+scan f32 and bf16
#  2. fused-path h=64 multi-seed quality rows (seed 0 = 0.9596 from r3)
#  3. x86 multi-label regime with the fixed focal loss (vs the r3
#     plain-CE row: per-class AUROC 0.9315, F1 0.6054, recall 0.516)
set -uo pipefail
cd /root/repo

echo "== r4a sweep batch 1 (re-baseline) start $(date +%T)"
python scripts/tpu_sweep.py coo_scan64 coo_scan_bf16_64 coo_scan128 \
  coo_scan_bf16_128 coo_scan_bf16_32 fused_coo_scan64 fused_coo_scan128 \
  >> logs/sweep_r4.log 2>&1 || echo "== sweep batch 1 FAILED"
echo "== r4a sweep batch 1 done $(date +%T)"

GCNBMP_FUSED_BF16=1 python scripts/tpu_sweep.py fused_coo_scan64 \
  fused_coo_scan128 \
  >> logs/sweep_r4.log 2>&1 || echo "== sweep fused-bf16 FAILED"
echo "== r4a sweep fused-bf16 done $(date +%T)"

ISC=dataset/synth546/inter/isc35000_train.csv
VAL=dataset/synth546/inter/ddi_inter_valid.csv
TEST=dataset/synth546/inter/ddi_inter_test.csv

# fused-path multi-seed rows (same config as r3 ref_scale_fused64)
for SEED in 1 2; do
  OUT=results/ref_scale_fused64_s$SEED
  if [ ! -f $OUT/eval/eval_result.json ]; then
    echo "== fused64 seed $SEED start $(date +%T)"
    python train.py --train $ISC --val $VAL \
      --method ggnn --conv-layers 8 --fp-hidden-dim 64 --fp-out-dim 64 \
      --weight-tying false --compute-path fused --scan-steps 10 \
      --batch-size 2048 --lr 2e-3 --epochs 80 --patience 10 --augment \
      --no-eval-train --seed $SEED --out $OUT \
      || echo "== fused64 seed $SEED TRAIN FAILED"
    python eval.py --test $TEST --run $OUT --checkpoint best \
      --out $OUT/eval || echo "== fused64 seed $SEED EVAL FAILED"
    echo "== fused64 seed $SEED done $(date +%T)"
  fi
done

# x86 regime with the fixed focal loss (VERDICT r3 #5) — identical
# config to the r3 kaist1704_x86_bf16 row except --loss focal
OUT=results/kaist1704_x86_focal
if [ ! -f $OUT/eval/eval_result.json ]; then
  echo "== x86 focal start $(date +%T)"
  python train.py \
    --train dataset/synth1704x86/kaist/ddi_train_multi.csv \
    --val dataset/synth1704x86/kaist/ddi_valid_multi.csv \
    --labels-csv dataset/synth1704x86/labels.csv \
    --method ggnn --sim-method hole --conv-layers 8 --weight-tying false \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 512 --lr 2e-3 \
    --compute-path coo --compute-dtype bfloat16 --scan-steps 10 \
    --epochs 120 --patience 25 --exp-shift-strategy 3 --loss focal \
    --no-eval-train --seed 0 --out $OUT \
    || echo "== x86 focal TRAIN FAILED"
  python eval.py --test dataset/synth1704x86/kaist/ddi_test_multi.csv \
    --run $OUT --checkpoint best \
    --labels-csv dataset/synth1704x86/labels.csv \
    --out $OUT/eval || echo "== x86 focal EVAL FAILED"
  echo "== x86 focal done $(date +%T)"
fi

echo R4A_QUEUE_DONE
