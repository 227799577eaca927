#!/bin/bash
# Round-5 TPU queue F: nie co-attention quality row through the NEW
# fastest config (scan mode + execution-mode-matched scatter VJP —
# 6.80 ms/step, DESIGN 9e) at reference scale.
set -uo pipefail
cd /root/repo
mkdir -p logs results

if [ ! -f results/ref_scale_nie_scan_r5/eval/eval_result.json ]; then
  echo "== nie_scan_r5 start $(date +%T)"
  python train.py --train dataset/synth546/inter/isc35000_train.csv \
    --val dataset/synth546/inter/ddi_inter_valid.csv \
    --method ggnn --sim-method ntn --attn nie --conv-layers 8 \
    --fp-hidden-dim 32 --fp-out-dim 32 --weight-tying false \
    --compute-path coo --compute-dtype bfloat16 --scan-steps 10 \
    --batch-size 2048 --lr 2e-3 --epochs 80 --patience 10 --augment \
    --no-eval-train --seed 0 --out results/ref_scale_nie_scan_r5 \
    || echo "== nie_scan_r5 TRAIN FAILED"
  python eval.py --test dataset/synth546/inter/ddi_inter_test.csv \
    --run results/ref_scale_nie_scan_r5 --checkpoint best \
    --out results/ref_scale_nie_scan_r5/eval \
    || echo "== nie_scan_r5 EVAL FAILED"
  echo "== nie_scan_r5 done $(date +%T)"
fi
python examples/collect_quality.py
python examples/backfill_provenance.py
echo R5F_QUEUE_DONE
