#!/bin/sh
# Sequential TPU work queue for round 1 (the axon relay is single-client).
set -x
cd /root/repo

# 1. wait for the descriptor run to finish
while pgrep -f "stage descriptor --steps 4000" >/dev/null 2>&1; do sleep 20; done

# 2. filter/confidence stage on top of the descriptor checkpoint
timeout 3600 python scripts/train.py --stage filter --steps 5500 --points 6144 \
  --pool-pairs 256 --ckpt-dir runs/synth_v2 --resume --log-every 100 \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  --set "train.batch_pairs=4" --set "train.checkpoint_every=500" \
  --set "train.learning_rate=5e-4" > /tmp/train_filter.log 2>&1

# 3. benchmarks with the trained checkpoint
timeout 1800 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v2 --json-out /tmp/recall_trained.json \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  > /tmp/bench_pairwise_trained.log 2>&1

timeout 1800 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v2 --json-out /tmp/mv_trained.json \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  --set "sync.cauchy_b=0.15" --set "sync.num_iters=8" \
  > /tmp/bench_multiview_trained.log 2>&1

# also no-filter ablation (robust path only)
timeout 1800 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v2 --no-filter \
  --json-out /tmp/recall_nofilter.json \
  --set "voxel.voxel_size=0.05" --set "voxel.capacities=(4096,2048,1024,512)" \
  > /tmp/bench_pairwise_nofilter.log 2>&1

# 4. throughput bench with bf16 path
timeout 1200 python bench.py > /tmp/bench_bf16.log 2>&1

# 5. stage profiling
timeout 1200 python /tmp/verify_mvreg/profile_stages.py > /tmp/profile_stages.log 2>&1

echo DONE > /tmp/chipqueue_done
