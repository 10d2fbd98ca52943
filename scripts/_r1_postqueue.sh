#!/bin/sh
# Post-training TPU measurements (waits for the train queue to finish;
# axon relay is single-client so everything stays sequential).
set -x
cd /root/repo
while [ ! -f runs/results/trainqueue_done ]; do sleep 30; done

# 1. Conv-schedule A/B at bench scale: gather-GEMM vs dense-grid UNet.
timeout 3600 python scripts/descriptor_bench.py --impls fused,dense \
  --json-out runs/results/descriptor_ab.json \
  > runs/results/descriptor_ab.log 2>&1

# 2. End-to-end pipeline bench, both schedules.
timeout 2400 python bench.py > runs/results/bench_fused.log 2>&1
MVREG_CONV_IMPL=dense timeout 2400 python bench.py \
  > runs/results/bench_dense.log 2>&1

# 3. Same A/B at the trained eval scale (0.05 m voxels).
timeout 2400 python scripts/descriptor_bench.py --impls fused,dense \
  --points 6144 --voxel-size 0.05 --caps 4096,2048,1024,512 \
  --dense-grid 64,64,64 \
  --json-out runs/results/descriptor_ab_eval.json \
  > runs/results/descriptor_ab_eval.log 2>&1

echo DONE > runs/results/postqueue_done
