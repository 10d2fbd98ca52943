#!/bin/sh
# Stage 7: on-chip accuracy parity of the dense schedule on the trained
# checkpoint (math-identical by construction + CPU tests; this confirms
# it on TPU at eval scale), and the trained pairwise benchmark under it.
set -x
cd /root/repo
while [ ! -f runs/results/postqueue6_done ]; do sleep 30; done

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v3 \
  --set "model.conv_impl='dense'" --set "voxel.dense_grid=(64,64,64)" \
  --json-out runs/results/recall_trained_dense.json \
  > runs/results/bench_pairwise_dense.log 2>&1

timeout 1800 python scripts/diagnose_pair.py --ckpt runs/synth_v3 \
  --points 6144 --seeds 0 1 100 \
  --set "model.conv_impl='dense'" --set "voxel.dense_grid=(64,64,64)" \
  --json-out runs/results/diag_dense.json \
  > runs/results/diag_dense.log 2>&1

echo DONE > runs/results/postqueue7_done
