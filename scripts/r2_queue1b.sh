#!/bin/sh
# Continuation of r2_queue1.sh after its shell was reaped: waits for the
# orphaned first step (diagnose_pair, pid $1) to exit, then runs the
# remaining steps. Bounded wait — no unbounded sentinel polling.
set -x
cd /root/repo
R=runs/results
CK=runs/synth_v5

WAIT_PID=$1
n=0
while [ -n "$WAIT_PID" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  n=$((n + 1))
  [ $n -gt 240 ] && break  # 2 h hard cap on the wait
  sleep 30
done

timeout 3600 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt runs/synth_v4 \
  --json-out $R/r2_mv30_v4_subvoxel.json > $R/r2_mv30_v4_subvoxel.log 2>&1

timeout 3600 python scripts/diagnose_scene.py --ckpt runs/synth_v4 \
  --fragments 30 --points 6144 --seed 0 \
  --json-out $R/r2_scene_diag.json > $R/r2_scene_diag2.log 2>&1

# (b) descriptor fine-tune (+1500 steps, subvoxel labels)
timeout 7200 python scripts/train.py --stage descriptor --steps 15900 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=5e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.checkpoint_every=300" \
  > $R/r2_train_desc_v5.log 2>&1

# (c) filter/confidence fine-tune (+1000 steps, 30% negatives)
timeout 4800 python scripts/train.py --stage filter --steps 16900 \
  --points 6144 --pool-pairs 512 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=3e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.checkpoint_every=250" \
  > $R/r2_train_filter_v5.log 2>&1

# (d) sync fine-tune END-TO-END (+400 steps, descriptor grads on)
timeout 5400 python scripts/train.py --stage sync --steps 17300 \
  --points 4096 --fragments 4 --pool-pairs 64 --ckpt-dir $CK --resume \
  --log-every 20 --set "train.batch_pairs=1" \
  --set "train.checkpoint_every=100" --set "train.learning_rate=1e-4" \
  --set "train.sync_train_descriptor=true" \
  > $R/r2_train_sync_v5.log 2>&1

# (e) eval battery on v5
timeout 1800 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --negative-seeds 0 1 2 3 4 \
  --json-out $R/r2_diag_v5.json > $R/r2_diag_v5.log 2>&1

timeout 1800 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --json-out $R/r2_recall_v5.json \
  > $R/r2_recall_v5.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --json-out $R/r2_mv8_v5.json \
  > $R/r2_mv8_v5.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt $CK --json-out $R/r2_mv30_v5.json \
  > $R/r2_mv30_v5.log 2>&1

echo QUEUE1B_DONE
