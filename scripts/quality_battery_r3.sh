#!/bin/bash
# Round-3 quality battery (VERDICT r2 #1/#3/#4/#6):
#  - fused Pallas production path (fused+COO+scan) converged at h=64
#  - GWM re-run on its production COO/scan path at full scale
#  - NFP at full isc35000 on the packed COO path
#  - MPNN full-scale re-run on the flattened EdgeNet path
#  - JKNet-GRU multi-label at full scale on the packed COO path
#  - x86 multi-label regime (1704 drugs x 86 types)
set -uo pipefail
cd /root/repo

train_eval () {  # train_eval OUTDIR TRAIN VAL TEST [extra args...]
  local out=$1 train=$2 val=$3 test=$4; shift 4
  if [ -f "results/$out/eval/eval_result.json" ]; then
    echo "== $out already done, skipping"; return 0
  fi
  echo "== $out start $(date +%T)"
  python train.py --train "$train" --val "$val" \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 2048 --lr 2e-3 \
    --no-eval-train --seed 0 --out "results/$out" "$@" \
    || { echo "== $out TRAIN FAILED"; return 0; }
  python eval.py --test "$test" --run "results/$out" --checkpoint best \
    --out "results/$out/eval" ${EVAL_EXTRA:-} \
    || echo "== $out EVAL FAILED"
  echo "== $out done $(date +%T)"
}

ISC=dataset/synth546/inter/isc35000_train.csv
VAL=dataset/synth546/inter/ddi_inter_valid.csv
TEST=dataset/synth546/inter/ddi_inter_test.csv

# 1. fused+COO+scan production path, converged at h=64 (its winning width)
if [ ! -f results/ref_scale_fused64/eval/eval_result.json ]; then
  echo "== ref_scale_fused64 start $(date +%T)"
  python train.py --train $ISC --val $VAL \
    --method ggnn --conv-layers 8 --fp-hidden-dim 64 --fp-out-dim 64 \
    --weight-tying false --compute-path fused --scan-steps 10 \
    --batch-size 2048 --lr 2e-3 --epochs 80 --patience 10 --augment \
    --no-eval-train --seed 0 --out results/ref_scale_fused64 \
    || echo "== ref_scale_fused64 TRAIN FAILED"
  python eval.py --test $TEST --run results/ref_scale_fused64 \
    --checkpoint best --out results/ref_scale_fused64/eval \
    || echo "== ref_scale_fused64 EVAL FAILED"
  echo "== ref_scale_fused64 done $(date +%T)"
fi

# 2. GWM on its production path: wire-compact COO + scan, full-scale val
train_eval ref_scale_gwm_cooscan $ISC $VAL $TEST \
  --method ggnn-gwm --sim-method hole --conv-layers 4 \
  --compute-path coo --scan-steps 10 --epochs 30 --patience 10 --augment

# 3. NFP at full isc35000 on the packed COO path
train_eval ref_scale_nfp_full $ISC $VAL $TEST \
  --method nfp --sim-method hole --conv-layers 4 \
  --compute-path coo --epochs 40 --patience 10 --augment

# 4. MPNN full-scale re-run on the flattened EdgeNet path
train_eval ref_scale_mpnn_full_r3 $ISC $VAL $TEST \
  --method mpnn --sim-method hole --conv-layers 4 --weight-tying true \
  --compute-path coo --epochs 40 --patience 10 --augment

# 5. JKNet-GRU multi-label at FULL scale on the packed COO path
EVAL_EXTRA="--labels-csv dataset/synth546/labels.csv" \
train_eval ref_scale_jkgru_multi_full \
  dataset/synth546/kaist/ddi_train_multi.csv \
  dataset/synth546/kaist/ddi_valid_multi.csv \
  dataset/synth546/kaist/ddi_test_multi.csv \
  --labels-csv dataset/synth546/labels.csv \
  --method ggnn --sim-method hole --conv-layers 8 --weight-tying false \
  --layer-aggregator gru --compute-path coo --epochs 80 --patience 10

# 6. x86 multi-label regime: 1704 drugs x 86 interaction types
EVAL_EXTRA="--labels-csv dataset/synth1704x86/labels.csv --batch-size 512" \
train_eval kaist1704_x86_bf16 \
  dataset/synth1704x86/kaist/ddi_train_multi.csv \
  dataset/synth1704x86/kaist/ddi_valid_multi.csv \
  dataset/synth1704x86/kaist/ddi_test_multi.csv \
  --labels-csv dataset/synth1704x86/labels.csv \
  --method ggnn --sim-method hole --conv-layers 8 --weight-tying false \
  --compute-path coo --compute-dtype bfloat16 --scan-steps 10 \
  --epochs 120 --patience 25 --exp-shift-strategy 3

echo QUALITY_BATTERY_R3_DONE
