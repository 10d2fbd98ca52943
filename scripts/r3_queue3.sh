#!/bin/bash
# Round-3 chip queue #3: lane-gather conv validation + kernel sweeps +
# voxelize-backend A/B, then the v7 training campaign (richer worlds,
# low-descriptor-lr e2e sync) and its eval battery.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r3 queue3 start $(date) ==="

echo "--- [1/12] mosaic probe2 (lane gather + soft bisect) ---"
timeout 1200 python scripts/mosaic_probe2.py > "$R/r3_mosaic_probe2.log" 2>&1
echo "rc=$? $(date)"; grep probe2 "$R/r3_mosaic_probe2.log" | head -8

echo "--- [2/12] conv microbench L0 (incl pallas2) ---"
timeout 1800 python scripts/conv_microbench.py \
  --batch 8 --voxels 8192 --cin 32 --cout 32 \
  > "$R/r3_convmb2_l0.log" 2>&1
echo "rc=$? $(date)"; grep -E "^(fused|taps|einsum|pallas)" "$R/r3_convmb2_l0.log"

echo "--- [3/12] conv microbench L2 (cin=cout=128) ---"
timeout 1800 python scripts/conv_microbench.py \
  --batch 8 --voxels 2048 --cin 128 --cout 128 \
  > "$R/r3_convmb2_l2.log" 2>&1
echo "rc=$? $(date)"; grep -E "^(fused|taps|einsum|pallas)" "$R/r3_convmb2_l2.log"

echo "--- [4/12] match tile sweep ---"
timeout 2400 python scripts/match_tile_sweep.py \
  --na 2048 --nb 8192 --batch 8 --reps 10 \
  --json-out "$R/r3_match_sweep.json" > "$R/r3_match_sweep.log" 2>&1
echo "rc=$? $(date)"; grep '"best"' -A2 "$R/r3_match_sweep.json" 2>/dev/null | head -3

echo "--- [5/12] voxelize lookup backend A/B (hash vs sortjoin) ---"
timeout 1800 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='taps'" --set "voxel.lookup='hash'" \
  --json-out "$R/r3_stages_hash.json" > "$R/r3_stages_hash.log" 2>&1
echo "rc=$? $(date)"; grep -E "1_voxelize|2_unet" "$R/r3_stages_hash.log" | head -2

echo "--- [6/12] bench with pallas2 conv (only if microbench passed) ---"
if grep -q '"pallas2": {"ms"' "$R/r3_convmb2_l0.log"; then
  MVREG_BENCH_PAIRS=8 MVREG_CONV_IMPL=pallas2 timeout 3000 python bench.py \
    > "$R/r3_bench_p8_pallas2.log" 2>&1
  echo "rc=$? $(date)"; tail -1 "$R/r3_bench_p8_pallas2.log"
else
  echo "SKIP: pallas2 microbench did not pass"
fi

echo "--- [6b] mv30 v4 with graduated-scale GN + overlap edge floor ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v4 --set "match.num_corr=2048" \
  --json-out "$R/r3_mv30_v4_gnc.json" > "$R/r3_mv30_v4_gnc.log" 2>&1
echo "rc=$? $(date)"; grep -E "median|ECDF|translation" "$R/r3_mv30_v4_gnc.log" | tail -3

# ---------------- v7 training campaign ----------------
CK=runs/synth_v7
[ -d $CK ] || cp -r runs/synth_v6 $CK

echo "--- [7/12] v7 descriptor fine-tune (+6000, richer worlds) ---"
timeout 7200 python scripts/train.py --stage descriptor --steps 21500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=500" \
  > "$R/r3_train_desc_v7.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r3_train_desc_v7.log"

echo "--- [8/12] v7 filter/confidence fine-tune (+1500) ---"
timeout 4800 python scripts/train.py --stage filter --steps 23000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir $CK --resume --log-every 100 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=500" \
  > "$R/r3_train_filter_v7.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r3_train_filter_v7.log"

echo "--- [9/12] v7 e2e sync stage (descriptor 50x slower, BN frozen) ---"
timeout 5400 python scripts/train.py --stage sync --steps 23600 \
  --points 4096 --fragments 4 --pool-pairs 64 --ckpt-dir $CK --resume \
  --log-every 20 --set "train.batch_pairs=1" \
  --set "train.checkpoint_every=100" --set "train.learning_rate=1e-4" \
  --set "train.sync_train_descriptor=true" \
  --set "train.descriptor_lr_scale=0.02" \
  > "$R/r3_train_sync_v7.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r3_train_sync_v7.log"

echo "--- [10/12] v7 descriptor quality probe ---"
timeout 2400 python scripts/diagnose_pair.py --ckpt $CK --points 6144 \
  --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
  --json-out "$R/r3_diag_v7.json" > "$R/r3_diag_v7.log" 2>&1
echo "rc=$? $(date)"; grep -E "inlier" "$R/r3_diag_v7.log" | tail -4

echo "--- [11/12] v7 overlap-filtered recall ---"
timeout 2700 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --set "match.num_corr=2048" \
  --json-out "$R/r3_recall_v7.json" > "$R/r3_recall_v7.log" 2>&1
echo "rc=$? $(date)"; tail -3 "$R/r3_recall_v7.log"

echo "--- [12/12] v7 mv8 + mv30 ---"
timeout 2700 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --set "match.num_corr=2048" \
  --json-out "$R/r3_mv8_v7.json" > "$R/r3_mv8_v7.log" 2>&1
echo "rc=$? mv8 $(date)"; grep median "$R/r3_mv8_v7.log" | tail -2
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK --set "match.num_corr=2048" \
  --json-out "$R/r3_mv30_v7.json" > "$R/r3_mv30_v7.log" 2>&1
echo "rc=$? mv30 $(date)"; grep median "$R/r3_mv30_v7.log" | tail -2

echo "=== r3 queue3 done $(date) ==="
