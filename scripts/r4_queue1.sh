#!/bin/bash
# Round-4 chip queue #1: kernel-tap scaling (microbench + bench A/B),
# v8 sparse-support fine-tunes from the sliced v7 checkpoints, quality
# probes, and the point-to-plane ICP accuracy A/B at the flagship.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r4 queue1 start $(date) ==="

echo "--- [1/9] tap-scaling conv microbench (taps impl, L0 shape) ---"
for K in 27 19 7; do
  timeout 1200 python scripts/conv_microbench.py \
    --batch 8 --voxels 8192 --cin 32 --cout 32 --ktaps $K --impls taps \
    > "$R/r4_convmb_k$K.log" 2>&1
  echo "K=$K rc=$? $(date)"; grep -E "^taps" "$R/r4_convmb_k$K.log"
done

echo "--- [2/9] bench kernel_taps=19 (untrained weights, xla match) ---"
MVREG_TAPS=19 MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k19.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k19.log"

echo "--- [3/9] bench kernel_taps=7 ---"
MVREG_TAPS=7 MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k7.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k7.log"

echo "--- [4/9] v8k19 fine-tune: descriptor +3000, filter +1500 ---"
timeout 4800 python scripts/train.py --stage descriptor --steps 26000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k19 --resume \
  --log-every 100 \
  --set "train.learning_rate=1.5e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v2'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=500" \
  > "$R/r4_train_desc_k19.log" 2>&1
echo "desc rc=$? $(date)"; tail -2 "$R/r4_train_desc_k19.log"
timeout 3600 python scripts/train.py --stage filter --steps 27500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k19 --resume \
  --log-every 100 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=500" \
  > "$R/r4_train_filter_k19.log" 2>&1
echo "filter rc=$? $(date)"; tail -2 "$R/r4_train_filter_k19.log"

echo "--- [5/9] v8k7 fine-tune: descriptor +3000, filter +1500 ---"
timeout 4800 python scripts/train.py --stage descriptor --steps 26000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k7 --resume \
  --log-every 100 \
  --set "train.learning_rate=1.5e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v2'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=500" \
  > "$R/r4_train_desc_k7.log" 2>&1
echo "desc rc=$? $(date)"; tail -2 "$R/r4_train_desc_k7.log"
timeout 3600 python scripts/train.py --stage filter --steps 27500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k7 --resume \
  --log-every 100 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=500" \
  > "$R/r4_train_filter_k7.log" 2>&1
echo "filter rc=$? $(date)"; tail -2 "$R/r4_train_filter_k7.log"

echo "--- [6/9] descriptor quality probes (v7_presync vs v8k19 vs v8k7) ---"
for CK in synth_v7_presync synth_v8k19 synth_v8k7; do
  timeout 2400 python scripts/diagnose_pair.py --ckpt runs/$CK \
    --points 6144 --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
    --json-out "$R/r4_diag_$CK.json" > "$R/r4_diag_$CK.log" 2>&1
  echo "$CK rc=$? $(date)"; grep -o '"gt_inlier_rate[^,]*' "$R/r4_diag_$CK.json" | head -2
done

echo "--- [7/9] mv30 flagship WITH plane ICP (new defaults) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r4_mv30_plane.json" > "$R/r4_mv30_plane.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_plane.log" | tail -3

echo "--- [8/9] mv30 flagship WITHOUT plane ICP (attribution) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --set "match.icp_plane_iters=0" --set "sync.scene_icp_plane_rounds=0" \
  --json-out "$R/r4_mv30_noplane.json" > "$R/r4_mv30_noplane.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_noplane.log" | tail -3

echo "--- [9/9] mv8 with plane ICP ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r4_mv8_plane.json" > "$R/r4_mv8_plane.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv8_plane.log" | tail -3

echo "=== r4 queue1 done $(date) ==="
