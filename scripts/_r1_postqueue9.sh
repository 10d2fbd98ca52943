#!/bin/sh
# Stage 9: (a) full-pipeline bench A/B of the conv schedule (the
# descriptor-stage scan said taps > fused at bench scale); (b) fresh
# curriculum retrain (overlap shift range + zero-overlap negatives,
# batching.py) into runs/synth_v4, with staged probes and the trained
# benchmarks under the sweep-winning sync settings (refine_iters=2 is
# now the schema default and is recorded in the ckpt config.yaml).
set -x
cd /root/repo
while [ ! -f runs/results/postqueue8_done ]; do sleep 30; done

# (a) conv-schedule A/B on the full bench
timeout 3600 python bench.py > runs/results/bench_fused_full.log 2>&1
MVREG_CONV_IMPL=taps timeout 3600 python bench.py \
  > runs/results/bench_taps_full.log 2>&1

# (b) curriculum retrain
CK=runs/synth_v4
V1='voxel.voxel_size=0.05'
V2='voxel.capacities=(4096,2048,1024,512)'

timeout 14400 python scripts/train.py --stage descriptor --steps 4500 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --log-every 100 \
  --set "$V1" --set "$V2" \
  --set "train.batch_pairs=4" --set "train.checkpoint_every=500" \
  --set "train.learning_rate=1e-3" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  > runs/results/train_desc_v4.log 2>&1

timeout 1800 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --json-out runs/results/diag_desc_v4.json \
  > runs/results/diag_desc_v4.log 2>&1

# filter/confidence stage sees junk edges too (negatives calibrate the
# confidence head for the mostly-junk C(N,2) graphs)
timeout 10800 python scripts/train.py --stage filter --steps 10500 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=5e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.2" \
  > runs/results/train_filter_v4.log 2>&1

timeout 7200 python scripts/train.py --stage sync --steps 10800 \
  --points 4096 --fragments 4 --pool-pairs 64 --ckpt-dir $CK --resume \
  --log-every 20 --set "train.batch_pairs=1" \
  --set "train.checkpoint_every=100" --set "train.learning_rate=2e-4" \
  > runs/results/train_sync_v4.log 2>&1

# trained evals (ckpt config auto-resolves voxel/model settings)
timeout 1800 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --json-out runs/results/diag_final_v4.json \
  > runs/results/diag_final_v4.log 2>&1

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --json-out runs/results/recall_trained_v4.json \
  > runs/results/bench_pairwise_v4.log 2>&1

timeout 3600 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --json-out runs/results/mv_trained_v4.json \
  > runs/results/bench_multiview_v4.log 2>&1

# headline 30-fragment scene (ScanNet protocol scale)
timeout 5400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt $CK \
  --json-out runs/results/mv30_trained_v4.json \
  > runs/results/bench_mv30_v4.log 2>&1

echo DONE > runs/results/postqueue9_done
