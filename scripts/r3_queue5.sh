#!/bin/bash
# Round-3 chip queue #5 (final): config-3 8-scene recall, the GN and
# e2e-stage attribution A/Bs, and the official-defaults bench as the
# last chip job (leaves a warm healthy relay for the driver).
cd /root/repo
R=runs/results
CK=runs/synth_v7
exec 2>&1

echo "=== r3 queue5 start $(date) ==="

echo "--- [0/6] stage profile: taps + symjoin (rerun after assert fix) ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='taps'" --set "voxel.lookup='symjoin'" \
  --json-out "$R/r3_stages_symjoin.json" > "$R/r3_stages_symjoin.log" 2>&1
echo "rc=$? $(date)"; grep -E "1_voxelize|2_unet|7_edges|sum_of" "$R/r3_stages_symjoin.log" | head -4

echo "--- [0b] stage profile: BRICK (rerun after plan_lookup fix) ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='brick'" \
  --json-out "$R/r3_stages_brick.json" > "$R/r3_stages_brick.log" 2>&1
echo "rc=$? $(date)"; grep -E "1_voxelize|2_unet|7_edges|sum_of" "$R/r3_stages_brick.log" | head -4

echo "--- [1/6] config-3: 8-scene overlap-filtered recall (stand-ins) ---"
timeout 5400 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --json-out "$R/r3_recall_full8.json" > "$R/r3_recall_full8.log" 2>&1
echo "rc=$? $(date)"; tail -12 "$R/r3_recall_full8.log" | grep -E "recall|mean" | head -6

echo "--- [2/6] mv8 v7 GN-off (GN attribution) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv8_v7_nogn.json" > "$R/r3_mv8_v7_nogn.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean rot|median" "$R/r3_mv8_v7_nogn.log" | tail -2

echo "--- [3/6] mv30 v7 GN-off ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv30_v7_nogn.json" > "$R/r3_mv30_v7_nogn.log" 2>&1
echo "rc=$? $(date)"; grep -E "ECDF|mean rot" "$R/r3_mv30_v7_nogn.log" | tail -3

echo "--- [4/6] mv30 v7-presync (e2e sync-stage attribution) ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r3_mv30_presync.json" > "$R/r3_mv30_presync.log" 2>&1
echo "rc=$? $(date)"; grep -E "ECDF|mean rot" "$R/r3_mv30_presync.log" | tail -3

echo "--- [5/6] recall v7-presync (e2e attribution, same 2 scenes) ---"
timeout 2700 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r3_recall_presync.json" > "$R/r3_recall_presync.log" 2>&1
echo "rc=$? $(date)"; grep -E "recall" "$R/r3_recall_presync.log" | tail -3

echo "--- [5b] bench: brick schedule retry (chunked windows) ---"
MVREG_BENCH_PAIRS=8 MVREG_CONV_IMPL=brick timeout 3600 python bench.py \
  > "$R/r3_bench_p8_brick2.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_p8_brick2.log" | head -c 300; echo

echo "--- [6/6] official bench at shipped defaults ---"
timeout 3600 python bench.py > "$R/r3_bench_official.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_official.log"

echo "=== r3 queue5 done $(date) ==="
