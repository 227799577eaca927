#!/bin/bash
# Round-5 TPU queue A — evidence regeneration (VERDICT r4 weak #5):
# the gitignored results/ dirs did not survive the round snapshot, so
# re-run the rows whose committed evidence was incomplete and snapshot
# their small artifacts into TRACKED docs/results/<row>/ via
# examples/collect_quality.py:
#   1. flagship ref_scale (fresh eval_result.json + full config/seed)
#   2. x37 schedule-3 extended row (the per-class breakdown QUALITY.md
#      cites) — re-run as kaist1704_x37_s3
#   3. x86 focal alpha=0.25 and alpha=0.75 (the two "—" wall-time
#      cells in QUALITY.md's table)
set -uo pipefail
cd /root/repo
mkdir -p logs results

train_done () { [ -f "results/$1/eval/eval_result.json" ]; }

# 1. flagship
if ! train_done ref_scale_r5; then
  echo "== ref_scale_r5 start $(date +%T)"
  python train.py --train dataset/synth546/inter/isc35000_train.csv \
    --val dataset/synth546/inter/ddi_inter_valid.csv \
    --method ggnn --conv-layers 8 --fp-hidden-dim 32 --fp-out-dim 32 \
    --weight-tying false --compute-path coo --batch-size 2048 --lr 2e-3 \
    --sim-method hole --epochs 80 --patience 10 --augment \
    --no-eval-train --seed 0 --out results/ref_scale_r5 \
    || echo "== ref_scale_r5 TRAIN FAILED"
  python eval.py --test dataset/synth546/inter/ddi_inter_test.csv \
    --run results/ref_scale_r5 --checkpoint best \
    --out results/ref_scale_r5/eval || echo "== ref_scale_r5 EVAL FAILED"
  echo "== ref_scale_r5 done $(date +%T)"
fi

# 2. x37 extended (schedule 3, 250-epoch budget — the per-class row)
if ! train_done kaist1704_x37_s3; then
  echo "== x37_s3 start $(date +%T)"
  python train.py \
    --train dataset/synth1704/kaist/ddi_train_multi.csv \
    --val dataset/synth1704/kaist/ddi_valid_multi.csv \
    --labels-csv dataset/synth1704/labels.csv \
    --method ggnn --sim-method hole --conv-layers 8 --weight-tying false \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 512 --lr 2e-3 \
    --compute-path coo --compute-dtype bfloat16 --scan-steps 10 \
    --epochs 250 --patience 25 --exp-shift-strategy 3 \
    --no-eval-train --seed 0 --out results/kaist1704_x37_s3 \
    || echo "== x37_s3 TRAIN FAILED"
  python eval.py --test dataset/synth1704/kaist/ddi_test_multi.csv \
    --run results/kaist1704_x37_s3 --checkpoint best \
    --labels-csv dataset/synth1704/labels.csv \
    --out results/kaist1704_x37_s3/eval || echo "== x37_s3 EVAL FAILED"
  echo "== x37_s3 done $(date +%T)"
fi

# 3. x86 focal rows (alpha 0.25 default + alpha 0.75)
for A in 0.25 0.75; do
  TAG=$([ "$A" = "0.25" ] && echo kaist1704_x86_focal || echo kaist1704_x86_focal75)
  if ! train_done "$TAG"; then
    echo "== $TAG start $(date +%T)"
    python train.py \
      --train dataset/synth1704x86/kaist/ddi_train_multi.csv \
      --val dataset/synth1704x86/kaist/ddi_valid_multi.csv \
      --labels-csv dataset/synth1704x86/labels.csv \
      --method ggnn --sim-method hole --conv-layers 8 --weight-tying false \
      --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 512 --lr 2e-3 \
      --compute-path coo --compute-dtype bfloat16 --scan-steps 10 \
      --epochs 120 --patience 25 --exp-shift-strategy 3 \
      --loss focal --focal-alpha "$A" \
      --no-eval-train --seed 0 --out "results/$TAG" \
      || echo "== $TAG TRAIN FAILED"
    python eval.py --test dataset/synth1704x86/kaist/ddi_test_multi.csv \
      --run "results/$TAG" --checkpoint best \
      --labels-csv dataset/synth1704x86/labels.csv \
      --out "results/$TAG/eval" || echo "== $TAG EVAL FAILED"
    echo "== $TAG done $(date +%T)"
  fi
done

python examples/collect_quality.py
python examples/backfill_provenance.py
echo R5A_QUEUE_DONE
