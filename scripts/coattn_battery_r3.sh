#!/bin/bash
# Round-3: train the 9 co-attention variants that had no quality rows
# (VERDICT r2 Missing #1).  Same protocol as examples/ref_scale_battery.sh.
set -uo pipefail
cd /root/repo

run () {  # run OUTDIR [train.py extra args...]
  local out=$1; shift
  if [ -f "results/$out/eval/eval_result.json" ]; then
    echo "== $out already done, skipping"; return 0
  fi
  echo "== $out start $(date +%T)"
  python train.py --train dataset/synth546/inter/isc35000_train.csv \
    --val dataset/synth546/inter/ddi_inter_valid.csv \
    --method ggnn --conv-layers 8 --fp-hidden-dim 32 --fp-out-dim 32 \
    --weight-tying false --compute-path coo --batch-size 2048 --lr 2e-3 \
    --epochs 80 --patience 10 --augment --no-eval-train --seed 0 \
    --out "results/$out" "$@" || { echo "== $out TRAIN FAILED"; return 0; }
  python eval.py --test dataset/synth546/inter/ddi_inter_test.csv \
    --run "results/$out" --checkpoint best --out "results/$out/eval" \
    || echo "== $out EVAL FAILED"
  echo "== $out done $(date +%T)"
}

run ref_scale_fourier      --sim-method ntn --attn fourier
run ref_scale_pool         --sim-method ntn --attn pool
run ref_scale_lt           --sim-method ntn --attn lt
run ref_scale_deep         --sim-method ntn --attn deep
run ref_scale_verydeep     --sim-method ntn --attn very-deep
run ref_scale_extremedeep  --sim-method ntn --attn extreme-deep
run ref_scale_global       --sim-method hole --attn global
run ref_scale_dualglobal   --sim-method hole --attn dual-global
run ref_scale_neural       --sim-method hole --attn neural
echo COATTN_BATTERY_DONE
