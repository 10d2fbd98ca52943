#!/bin/sh
# Stage 5: sync-hyperparameter sweep on the trained checkpoint; the
# round-1 multiview translation ECDF is the weak metric — probe the
# robust-kernel scale, refinement rounds, and confidence threshold.
set -x
cd /root/repo
while [ ! -f runs/results/postqueue4_done ]; do sleep 30; done

for S in "sync.cauchy_b=0.3 sync.refine_iters=1" \
         "sync.cauchy_b=0.15 sync.refine_iters=2" \
         "sync.cauchy_b=0.5 sync.refine_iters=2" \
         "sync.cauchy_b=0.15 sync.refine_iters=2 sync.confidence_threshold=0.5"; do
  TAG=$(echo "$S" | tr ' =.' '__-')
  set -- $S
  ARGS=""
  for kv in "$@"; do ARGS="$ARGS --set $kv"; done
  timeout 2400 python scripts/benchmark_multiview.py --scenes 2 \
    --fragments 8 --points 6144 --ckpt runs/synth_v3 \
    --set "sync.num_iters=8" $ARGS \
    --json-out "runs/results/mv_sweep_$TAG.json" \
    > "runs/results/mv_sweep_$TAG.log" 2>&1
done

echo DONE > runs/results/postqueue5_done
