#!/bin/bash
# Round-5 chip queue #1: FROM-SCRATCH 7-tap descriptor campaign
# (round-4 VERDICT item 1 — the 103-107 fr/s tier ships only if a
# fast-support checkpoint holds accuracy; the r4 slice collapsed at
# mv30), with the quasi-periodic richness-v3 curriculum (alias-scene
# attack, VERDICT item 4), then the v8k19 confidence-head
# recalibration (stage=confidence; neg-conf bar <= 0.35), then the
# eval battery on both.
cd /root/repo
R=runs/results
CK=runs/synth_v9k7
exec 2>&1

echo "=== r5 queue1 start $(date) ==="

echo "--- [1/12] v9k7 D1: descriptor 0->4000 (lr 1e-3, v2 worlds) ---"
timeout 4500 python scripts/train.py --stage descriptor --steps 4000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --log-every 100 \
  --set "voxel.voxel_size=0.05" \
  --set "voxel.capacities=(4096,2048,1024,512)" \
  --set "model.kernel_taps=(7,7,7,7)" \
  --set "match.num_corr=2048" \
  --set "train.batch_pairs=1" \
  --set "train.learning_rate=1e-3" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v2'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=500" \
  > "$R/r5_train_d1_v9k7.log" 2>&1
echo "D1 rc=$? $(date)"; tail -2 "$R/r5_train_d1_v9k7.log" | head -1

echo "--- [2/12] v9k7 D2: descriptor ->12000 (lr 3e-4, v3 alias worlds) ---"
timeout 7200 python scripts/train.py --stage descriptor --steps 12000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=3e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v3'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=500" \
  > "$R/r5_train_d2_v9k7.log" 2>&1
echo "D2 rc=$? $(date)"; tail -2 "$R/r5_train_d2_v9k7.log" | head -1

echo "--- [3/12] v9k7 D3: descriptor ->16000 (lr 1e-4, v3) ---"
timeout 4500 python scripts/train.py --stage descriptor --steps 16000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=1e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v3'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=500" \
  > "$R/r5_train_d3_v9k7.log" 2>&1
echo "D3 rc=$? $(date)"; tail -2 "$R/r5_train_d3_v9k7.log" | head -1

echo "--- [4/12] v9k7 F: filter/confidence ->18500 (lr 2e-4, neg 0.3) ---"
timeout 4500 python scripts/train.py --stage filter --steps 18500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.world_richness='v3'" \
  --set "train.checkpoint_every=500" \
  > "$R/r5_train_f_v9k7.log" 2>&1
echo "F rc=$? $(date)"; tail -2 "$R/r5_train_f_v9k7.log" | head -1

echo "--- [5/12] v9k7 C: confidence-only ->19500 (lr 3e-4, neg 0.4) ---"
timeout 2400 python scripts/train.py --stage confidence --steps 19500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=3e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.4" \
  --set "train.world_richness='v3'" \
  --set "train.checkpoint_every=250" \
  > "$R/r5_train_c_v9k7.log" 2>&1
echo "C rc=$? $(date)"; tail -2 "$R/r5_train_c_v9k7.log" | head -1

echo "--- [6/12] diag v9k7 (inlier rate + confidence calibration) ---"
timeout 2400 python scripts/diagnose_pair.py --ckpt $CK \
  --points 6144 --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
  --json-out "$R/r5_diag_v9k7.json" > "$R/r5_diag_v9k7.log" 2>&1
echo "rc=$? $(date)"
grep -oE '"(mean_gt_inlier_rate|mean_negative_confidence)[^,}]*' "$R/r5_diag_v9k7.json" | head -4

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
