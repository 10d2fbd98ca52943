#!/bin/sh
# Stage 2 of the post-training TPU queue: driver-config-2 scale —
# one 30-fragment scene, all C(30,2)=435 edges + IRLS sync on device.
set -x
cd /root/repo
while [ ! -f runs/results/postqueue_done ]; do sleep 30; done

timeout 5400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt runs/synth_v3 \
  --set "sync.cauchy_b=0.15" --set "sync.num_iters=8" \
  --json-out runs/results/mv30_trained.json \
  > runs/results/bench_mv30_trained.log 2>&1

# Same scene through the dense-grid UNet schedule (shared checkpoint).
timeout 5400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt runs/synth_v3 \
  --set "model.conv_impl='dense'" --set "voxel.dense_grid=(64,64,64)" \
  --set "sync.cauchy_b=0.15" --set "sync.num_iters=8" \
  --json-out runs/results/mv30_trained_dense.json \
  > runs/results/bench_mv30_dense.log 2>&1

echo DONE > runs/results/postqueue2_done
