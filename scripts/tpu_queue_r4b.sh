#!/bin/bash
# Round-4 TPU queue, part B (VERDICT r3 #2/#5/#7): waits for part A,
# then
#  1. MPNN EdgeNet A/B: r3 flat contraction vs r4 aggregate-first
#  2. fused-kernel K-batched aggregation A/B (f32 + bf16, incl. the
#     fused+COO+scan production path at h=32/64)
#  3. hardware VJP parity of the K-batched kernel path (--verify)
#  4. sustained-pipeline knob sweep: pack workers 4/8, reuse_packs
#  5. reuse-packs quality row at reference scale (trade-off evidence)
set -uo pipefail
cd /root/repo

echo "== waiting for r4a queue"
while ! grep -q R4A_QUEUE_DONE logs/tpu_queue_r4a.log 2>/dev/null; do
  sleep 60
done
echo "== r4a done; starting r4b $(date +%T)"

python scripts/tpu_sweep.py mpnn_ab3 \
  >> logs/sweep_r4.log 2>&1 || echo "== mpnn_ab3 FAILED"
echo "== mpnn_ab3 done $(date +%T)"

python scripts/tpu_sweep.py fused32_kbatch fused64_kbatch fused128_kbatch \
  fused_coo_scan32_kbatch fused_coo_scan64_kbatch \
  >> logs/sweep_r4.log 2>&1 || echo "== kbatch sweep FAILED"
echo "== kbatch sweep done $(date +%T)"

GCNBMP_FUSED_BF16=1 python scripts/tpu_sweep.py fused32_kbatch \
  fused64_kbatch fused_coo_scan32_kbatch \
  >> logs/sweep_r4.log 2>&1 || echo "== kbatch bf16 sweep FAILED"
echo "== kbatch bf16 sweep done $(date +%T)"

GCNBMP_FUSED_KBATCH=1 timeout 1200 python bench.py --verify \
  >> logs/verify_r4_kbatch.log 2>&1 || echo "== kbatch verify FAILED"
echo "== kbatch verify done $(date +%T)"

# sustained knobs on the bf16 headline config
GCNBMP_BENCH_BF16=1 GCNBMP_PACK_WORKERS=4 timeout 900 python bench.py \
  --sustained >> logs/sustained_r4_w4.log 2>&1 || echo "== sustained w4 FAILED"
GCNBMP_BENCH_BF16=1 GCNBMP_PACK_WORKERS=8 timeout 900 python bench.py \
  --sustained >> logs/sustained_r4_w8.log 2>&1 || echo "== sustained w8 FAILED"
GCNBMP_BENCH_BF16=1 GCNBMP_SUSTAINED_REUSE=1 timeout 900 python bench.py \
  --sustained >> logs/sustained_r4_reuse.log 2>&1 \
  || echo "== sustained reuse FAILED"
echo "== sustained knob sweep done $(date +%T)"

# reuse-packs quality row: flagship config + --reuse-packs
ISC=dataset/synth546/inter/isc35000_train.csv
VAL=dataset/synth546/inter/ddi_inter_valid.csv
TEST=dataset/synth546/inter/ddi_inter_test.csv
OUT=results/ref_scale_reusepacks
if [ ! -f $OUT/eval/eval_result.json ]; then
  echo "== reusepacks quality row start $(date +%T)"
  python train.py --train $ISC --val $VAL \
    --method ggnn --conv-layers 8 --fp-hidden-dim 32 --fp-out-dim 32 \
    --weight-tying false --compute-path coo --compute-dtype bfloat16 \
    --scan-steps 10 --reuse-packs \
    --batch-size 2048 --lr 2e-3 --epochs 80 --patience 10 --augment \
    --no-eval-train --seed 0 --out $OUT \
    || echo "== reusepacks TRAIN FAILED"
  python eval.py --test $TEST --run $OUT --checkpoint best \
    --out $OUT/eval || echo "== reusepacks EVAL FAILED"
  echo "== reusepacks quality row done $(date +%T)"
fi

echo R4B_QUEUE_DONE
