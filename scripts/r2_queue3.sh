#!/bin/sh
# Round-2 chip queue 3: conservative v6 from v4 (the v5 fine-tune
# REGRESSED the descriptor: gt-inlier 0.146 -> 0.093, d_pos ~ d_neg —
# the aggressive descriptor lr + end-to-end sync stage drifted it).
# v6 touches only the filter/confidence heads (in-scene junk edges got
# mean conf 0.53 in the 30-fragment diagnosis) and reruns the sync
# stage WITHOUT descriptor gradients, then evals at the new defaults
# (subvoxel + spectral + overlap-RANSAC + ICP + overlap gate).
# Then the trimmed queue-2 items: Pallas conv on-chip validation and
# the per-stage MFU table.
set -x
cd /root/repo
R=runs/results
CK=runs/synth_v6
[ -d $CK ] || cp -r runs/synth_v4 $CK

timeout 4800 python scripts/train.py --stage filter --steps 15200 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.checkpoint_every=200" \
  > $R/r2_train_filter_v6.log 2>&1

timeout 3600 python scripts/train.py --stage sync --steps 15500 \
  --points 4096 --fragments 4 --pool-pairs 64 --ckpt-dir $CK --resume \
  --log-every 20 --set "train.batch_pairs=1" \
  --set "train.checkpoint_every=100" --set "train.learning_rate=1e-4" \
  > $R/r2_train_sync_v6.log 2>&1

timeout 1800 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --negative-seeds 0 1 2 3 4 \
  --json-out $R/r2_diag_v6.json > $R/r2_diag_v6.log 2>&1

timeout 1800 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --json-out $R/r2_recall_v6.json \
  > $R/r2_recall_v6.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --json-out $R/r2_mv8_v6.json \
  > $R/r2_mv8_v6.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt $CK --json-out $R/r2_mv30_v6.json \
  > $R/r2_mv30_v6.log 2>&1

# queue-2 trimmed: Pallas conv lowering validation + MFU stage table
timeout 2400 python scripts/conv_microbench.py --cin 32 --cout 32 \
  --voxels 8192 > $R/r2_convmb_l0.log 2>&1

timeout 1800 python scripts/profile_stages.py --points 16384 --pairs 4 \
  --reps 3 --json-out $R/r2_stage_mfu.json > $R/r2_stage_mfu.log 2>&1

echo QUEUE3_DONE
