#!/bin/bash
# Round-5 queue #5 (bonus): v8k19d = flagship v8k19c + a short
# richness-v3 alias-curriculum descriptor fine-tune (the lever that
# moved scene_0 for v9k7: 0.39 -> 0.444), then a confidence
# recalibration chaser (r4 lesson: descriptor tunes can silently
# regress neg-conf), then diag + recall8 + mv30. Ships only if it
# beats v8k19c on recall WITHOUT losing the mv30 bars.
cd /root/repo
R=runs/results
CK=runs/synth_v8k19d
exec 2>&1

echo "=== r5 queue5 start $(date) ==="
if [ ! -d $CK ]; then cp -r runs/synth_v8k19c $CK; rm -rf $CK/tb; fi

echo "--- [1/5] descriptor fine-tune ->37500 (v3 worlds, lr 1e-4) ---"
timeout 3000 python scripts/train.py --stage descriptor --steps 37500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=1e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v3'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=500" \
  > "$R/r5_train_d_v8k19d.log" 2>&1
echo "rc=$? $(date)"

echo "--- [2/5] confidence recalibration chaser ->38000 ---"
timeout 1800 python scripts/train.py --stage confidence --steps 38000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=3e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.4" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=250" \
  > "$R/r5_train_c_v8k19d.log" 2>&1
echo "rc=$? $(date)"

echo "--- [3/5] diag v8k19d ---"
timeout 1800 python scripts/diagnose_pair.py --ckpt $CK \
  --points 6144 --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
  --json-out "$R/r5_diag_v8k19d.json" > "$R/r5_diag_v8k19d.log" 2>&1
echo "rc=$? $(date)"
grep -oE '"(mean_gt_inlier_rate|mean_negative_confidence)[^,}]*' "$R/r5_diag_v8k19d.json" | head -2

echo "--- [4/5] recall8 v8k19d ---"
timeout 4800 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt $CK \
  --json-out "$R/r5_recall8_v8k19d.json" > "$R/r5_recall8_v8k19d.log" 2>&1
echo "rc=$? $(date)"
python -c "import json;d=json.load(open('$R/r5_recall8_v8k19d.json'));print('mean recall', d['recall']['mean']); print({k:round(v,2) for k,v in d['recall'].items() if k!='mean'})" 2>/dev/null

echo "--- [5/5] mv30 v8k19d (defaults-exact) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK \
  --json-out "$R/r5_mv30_v8k19d.json" > "$R/r5_mv30_v8k19d.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v8k19d.log" | tail -2

echo "=== r5 queue5 done $(date) ==="
