#!/bin/bash
# Round-5 TPU queue B (waits for A): MPNN quality row on the NEW
# production path — dense Set2Set running through the fused Pallas
# kernel (ops/set2set_kernel.py, auto-enabled on TPU) — the r4
# precedent: every compute-path change revalidates its quality row.
# Then the final bench refresh.
set -uo pipefail
cd /root/repo
mkdir -p logs results

echo "== waiting for r5a queue"
while ! grep -q R5A_QUEUE_DONE logs/tpu_queue_r5a.log 2>/dev/null; do
  sleep 60
done
echo "== r5a done; starting r5b $(date +%T)"

if [ ! -f results/ref_scale_mpnn_pallas_r5/eval/eval_result.json ]; then
  echo "== mpnn_pallas_r5 start $(date +%T)"
  python train.py --train dataset/synth546/inter/isc35000_train.csv \
    --val dataset/synth546/inter/ddi_inter_valid.csv \
    --method mpnn --sim-method hole --conv-layers 4 --weight-tying true \
    --fp-hidden-dim 32 --fp-out-dim 32 --batch-size 2048 --lr 2e-3 \
    --compute-path coo --compute-dtype bfloat16 \
    --epochs 40 --patience 10 --augment \
    --no-eval-train --seed 0 --out results/ref_scale_mpnn_pallas_r5 \
    || echo "== mpnn_pallas_r5 TRAIN FAILED"
  python eval.py --test dataset/synth546/inter/ddi_inter_test.csv \
    --run results/ref_scale_mpnn_pallas_r5 --checkpoint best \
    --out results/ref_scale_mpnn_pallas_r5/eval \
    || echo "== mpnn_pallas_r5 EVAL FAILED"
  echo "== mpnn_pallas_r5 done $(date +%T)"
fi

python examples/collect_quality.py
python examples/backfill_provenance.py
timeout 900 python bench.py > logs/bench_r5_final.log 2>&1 \
  || echo "== bench FAILED"
tail -1 logs/bench_r5_final.log
echo R5B_QUEUE_DONE
