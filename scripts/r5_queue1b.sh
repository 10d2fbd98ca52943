#!/bin/bash
# Round-5 queue #1b: rerun of queue1 steps 7-12 after the fused-kernel
# worker fault (pallas_fused now default-off; v9k7 yaml unpinned).
# Starts with a recovery idle for the faulted axon worker.
cd /root/repo
R=runs/results
CK=runs/synth_v9k7
exec 2>&1

echo "=== r5 queue1b start $(date) ==="
echo "--- recovery idle 240 s (pallas-match fault + killed chip process) ---"
sleep 240

echo "--- [7/12] recall8 v9k7 (defaults-exact) ---"
timeout 4800 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt $CK \
  --json-out "$R/r5_recall8_v9k7.json" > "$R/r5_recall8_v9k7.log" 2>&1
echo "rc=$? $(date)"
python -c "import json;d=json.load(open('$R/r5_recall8_v9k7.json'));print('mean recall', d['recall']['mean']); print('per-scene', {k:round(v,2) for k,v in d['recall'].items() if k!='mean'})" 2>/dev/null

echo "--- [8/12] mv30 v9k7 ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK \
  --json-out "$R/r5_mv30_v9k7.json" > "$R/r5_mv30_v9k7.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v9k7.log" | tail -3

echo "--- [9/12] mv8 v9k7 ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt $CK \
  --json-out "$R/r5_mv8_v9k7.json" > "$R/r5_mv8_v9k7.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv8_v9k7.log" | tail -3

echo "--- [10/12] v8k19c: confidence-head recalibration ->34500 ---"
if [ ! -d runs/synth_v8k19c ]; then cp -r runs/synth_v8k19 runs/synth_v8k19c; fi
timeout 2400 python scripts/train.py --stage confidence --steps 34500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k19c --resume \
  --log-every 100 \
  --set "train.learning_rate=3e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.4" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=250" \
  > "$R/r5_train_c_v8k19c.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r5_train_c_v8k19c.log" | head -1

echo "--- [11/12] diag v8k19c (neg-conf bar <= 0.35) ---"
timeout 2400 python scripts/diagnose_pair.py --ckpt runs/synth_v8k19c \
  --points 6144 --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
  --json-out "$R/r5_diag_v8k19c.json" > "$R/r5_diag_v8k19c.log" 2>&1
echo "rc=$? $(date)"
grep -oE '"(mean_gt_inlier_rate|mean_negative_confidence)[^,}]*' "$R/r5_diag_v8k19c.json" | head -4

echo "--- [12/12] recall8 v8k19c ---"
timeout 4800 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt runs/synth_v8k19c \
  --json-out "$R/r5_recall8_v8k19c.json" > "$R/r5_recall8_v8k19c.log" 2>&1
echo "rc=$? $(date)"
python -c "import json;d=json.load(open('$R/r5_recall8_v8k19c.json'));print('mean recall', d['recall']['mean'])" 2>/dev/null

echo "=== r5 queue1 done $(date) ==="
echo "=== r5 queue1b done $(date) ==="
