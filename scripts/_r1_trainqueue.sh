#!/bin/sh
# Sequential TPU retrain queue (fixed sampling code; axon relay is
# single-client). Stages: descriptor -> probe -> filter -> sync ->
# benchmarks. All results land under runs/results/.
set -x
cd /root/repo
mkdir -p runs/results
CK=runs/synth_v3

V1='voxel.voxel_size=0.05'
V2='voxel.capacities=(4096,2048,1024,512)'

# 1. descriptor pretraining (hardest-contrastive)
timeout 14400 python scripts/train.py --stage descriptor --steps 4500 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --log-every 100 \
  --set "$V1" --set "$V2" \
  --set "train.batch_pairs=4" --set "train.checkpoint_every=500" \
  --set "train.learning_rate=1e-3" > runs/results/train_desc.log 2>&1

# 2. descriptor-quality probe (gt inlier rate of putative matches)
timeout 1800 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --json-out runs/results/diag_desc.json \
  --set "$V1" --set "$V2" > runs/results/diag_desc.log 2>&1

# 3. filtering + confidence on the frozen descriptor
timeout 10800 python scripts/train.py --stage filter --steps 10500 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --resume --log-every 100 \
  --set "$V1" --set "$V2" \
  --set "train.batch_pairs=4" --set "train.checkpoint_every=500" \
  --set "train.learning_rate=5e-4" > runs/results/train_filter.log 2>&1

# 4. multiview fine-tune THROUGH the sync layer
timeout 7200 python scripts/train.py --stage sync --steps 10800 \
  --points 4096 --fragments 4 --pool-pairs 64 --ckpt-dir $CK --resume \
  --log-every 20 --set "$V1" --set "$V2" \
  --set "train.batch_pairs=1" --set "train.checkpoint_every=100" \
  --set "train.learning_rate=2e-4" > runs/results/train_sync.log 2>&1

# 5. trained benchmarks
timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --json-out runs/results/recall_trained.json \
  --set "$V1" --set "$V2" > runs/results/bench_pairwise_trained.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --json-out runs/results/mv_trained.json \
  --set "$V1" --set "$V2" --set "sync.cauchy_b=0.15" --set "sync.num_iters=8" \
  > runs/results/bench_multiview_trained.log 2>&1

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --no-filter \
  --json-out runs/results/recall_nofilter.json \
  --set "$V1" --set "$V2" > runs/results/bench_pairwise_nofilter.log 2>&1

# 6. probe after full training
timeout 1800 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --json-out runs/results/diag_final.json \
  --set "$V1" --set "$V2" > runs/results/diag_final.log 2>&1

echo DONE > runs/results/trainqueue_done
