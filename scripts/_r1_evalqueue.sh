#!/bin/sh
# Sequential TPU eval queue (axon relay is single-client).
# Produces accuracy + throughput JSONs under runs/results/.
set -x
cd /root/repo
mkdir -p runs/results

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v2 --json-out runs/results/recall_trained.json \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  > runs/results/bench_pairwise_trained.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v2 --json-out runs/results/mv_trained.json \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  --set "sync.cauchy_b=0.15" --set "sync.num_iters=8" \
  > runs/results/bench_multiview_trained.log 2>&1

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v2 --no-filter \
  --json-out runs/results/recall_nofilter.json \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  > runs/results/bench_pairwise_nofilter.log 2>&1

timeout 1800 python bench.py > runs/results/bench_tpu.log 2>&1

echo DONE > runs/results/evalqueue_done
