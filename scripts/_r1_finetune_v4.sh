#!/bin/sh
# Round-1 continuation: targeted fine-tune from runs/synth_v3 (step 10700)
# addressing RESULTS.md weak points:
#   (1) confidence calibration on junk edges -> filter stage with 20%
#       zero-overlap negative pairs + wider overlap curriculum;
#   (2) sync translation quality -> sync stage rerun under the hardened
#       (NaN-zeroing, Cauchy-robust translation loss) trainer.
# Then the trained eval battery + the conv-schedule full-bench A/B that
# was cut off at the end of the previous session.
set -x
cd /root/repo
R=runs/results
CK=runs/synth_v4
[ -d $CK ] || cp -r runs/synth_v3 $CK

# (1) filter/confidence fine-tune: +3000 steps with negatives
timeout 2400 python scripts/train.py --stage filter --steps 13700 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=3e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.2" \
  --set "train.checkpoint_every=500" \
  > $R/train_filter_v4.log 2>&1

# (2) sync fine-tune: +700 steps
timeout 2700 python scripts/train.py --stage sync --steps 14400 \
  --points 4096 --fragments 4 --pool-pairs 64 --ckpt-dir $CK --resume \
  --log-every 20 --set "train.batch_pairs=1" \
  --set "train.checkpoint_every=100" --set "train.learning_rate=2e-4" \
  > $R/train_sync_v4.log 2>&1

# evals (ckpt config auto-resolves voxel/model settings)
timeout 1200 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --json-out $R/diag_final_v4.json \
  > $R/diag_final_v4.log 2>&1

timeout 1500 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --json-out $R/recall_trained_v4.json \
  > $R/bench_pairwise_v4.log 2>&1

timeout 1800 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --json-out $R/mv_trained_v4.json \
  > $R/bench_multiview_v4.log 2>&1

timeout 1800 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK --json-out $R/mv30_trained_v4.json \
  > $R/bench_mv30_v4.log 2>&1

# conv-schedule A/B on the official bench (was interrupted last session)
timeout 1200 python bench.py > $R/bench_fused_full.log 2>&1
MVREG_CONV_IMPL=taps timeout 1200 python bench.py > $R/bench_taps_full.log 2>&1

touch $R/finetune_v4_done
