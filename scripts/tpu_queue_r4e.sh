#!/bin/bash
# Round-4 TPU queue, part E: waits for part D, then the x86 focal
# alpha sweep — alpha=0.25 (part A) improved per-class ranking (AUPRC
# 0.711 -> 0.781) but down-weights positives (recall 0.516 -> 0.422 at
# the 0.5 threshold); alpha=0.75 up-weights the rare positives.
set -uo pipefail
cd /root/repo

echo "== waiting for r4d queue"
while ! grep -q R4D_QUEUE_DONE logs/tpu_queue_r4d.log 2>/dev/null; do
  sleep 60
done
echo "== r4d done; starting r4e $(date +%T)"

OUT=results/kaist1704_x86_focal75
if [ ! -f $OUT/eval/eval_result.json ]; then
  echo "== x86 focal75 start $(date +%T)"
  python train.py \
    --train dataset/synth1704x86/kaist/ddi_train_multi.csv \
    --val dataset/synth1704x86/kaist/ddi_valid_multi.csv \
    --labels-csv dataset/synth1704x86/labels.csv \
    --method ggnn --sim-method hole --conv-layers 8 --weight-tying false \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 512 --lr 2e-3 \
    --compute-path coo --compute-dtype bfloat16 --scan-steps 10 \
    --epochs 120 --patience 25 --exp-shift-strategy 3 \
    --loss focal --focal-alpha 0.75 \
    --no-eval-train --seed 0 --out $OUT \
    || echo "== x86 focal75 TRAIN FAILED"
  python eval.py --test dataset/synth1704x86/kaist/ddi_test_multi.csv \
    --run $OUT --checkpoint best \
    --labels-csv dataset/synth1704x86/labels.csv \
    --out $OUT/eval || echo "== x86 focal75 EVAL FAILED"
  echo "== x86 focal75 done $(date +%T)"
fi
echo R4E_QUEUE_DONE
