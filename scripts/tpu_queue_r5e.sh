#!/bin/bash
# Round-5 TPU queue E: MPNN quality row on the fused-kernel production
# path (ops/fused_mpnn.py auto-on for TPU — the +44% step) + a
# backward-K probe.
set -uo pipefail
cd /root/repo
mkdir -p logs results

if [ ! -f results/ref_scale_mpnn_fusedkernel_r5/eval/eval_result.json ]; then
  echo "== mpnn_fusedkernel_r5 start $(date +%T)"
  python train.py --train dataset/synth546/inter/isc35000_train.csv \
    --val dataset/synth546/inter/ddi_inter_valid.csv \
    --method mpnn --sim-method hole --conv-layers 4 --weight-tying true \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 2048 --lr 2e-3 \
    --compute-path coo --compute-dtype bfloat16 \
    --epochs 40 --patience 10 --augment \
    --no-eval-train --seed 0 --out results/ref_scale_mpnn_fusedkernel_r5 \
    || echo "== mpnn_fusedkernel_r5 TRAIN FAILED"
  python eval.py --test dataset/synth546/inter/ddi_inter_test.csv \
    --run results/ref_scale_mpnn_fusedkernel_r5 --checkpoint best \
    --out results/ref_scale_mpnn_fusedkernel_r5/eval \
    || echo "== mpnn_fusedkernel_r5 EVAL FAILED"
  echo "== mpnn_fusedkernel_r5 done $(date +%T)"
fi
python examples/collect_quality.py
python examples/backfill_provenance.py
echo R5E_QUEUE_DONE
