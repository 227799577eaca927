#!/bin/bash
# Round-5 TPU queue D (waits for C): MPNN quality row on the FINAL
# round-5 production path (dotgen EdgeNet default + fused Pallas
# Set2Set) — the path-change revalidation precedent.
set -uo pipefail
cd /root/repo
mkdir -p logs results

echo "== waiting for r5c queue"
while ! grep -q R5C_QUEUE_DONE logs/tpu_queue_r5c.log 2>/dev/null; do
  sleep 30
done
echo "== r5c done; starting r5d $(date +%T)"

if [ ! -f results/ref_scale_mpnn_dotgen_r5/eval/eval_result.json ]; then
  echo "== mpnn_dotgen_r5 start $(date +%T)"
  python train.py --train dataset/synth546/inter/isc35000_train.csv \
    --val dataset/synth546/inter/ddi_inter_valid.csv \
    --method mpnn --sim-method hole --conv-layers 4 --weight-tying true \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 2048 --lr 2e-3 \
    --compute-path coo --compute-dtype bfloat16 \
    --epochs 40 --patience 10 --augment \
    --no-eval-train --seed 0 --out results/ref_scale_mpnn_dotgen_r5 \
    || echo "== mpnn_dotgen_r5 TRAIN FAILED"
  python eval.py --test dataset/synth546/inter/ddi_inter_test.csv \
    --run results/ref_scale_mpnn_dotgen_r5 --checkpoint best \
    --out results/ref_scale_mpnn_dotgen_r5/eval \
    || echo "== mpnn_dotgen_r5 EVAL FAILED"
  echo "== mpnn_dotgen_r5 done $(date +%T)"
fi
python examples/collect_quality.py
python examples/backfill_provenance.py
echo R5D_QUEUE_DONE
