#!/bin/bash
# Round-3 chip queue #2: Mosaic gather bisect, fixed Pallas match A/B,
# stage profile with the robust stack visible, and the first mv8/mv30
# evals with the global pose-graph GN in the sync path.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r3 queue2 start $(date) ==="

echo "--- [1/5] mosaic probe (gather construct bisect) ---"
timeout 1200 python scripts/mosaic_probe.py > "$R/r3_mosaic_probe.log" 2>&1
echo "rc=$? $(date)"; tail -7 "$R/r3_mosaic_probe.log"

echo "--- [2/5] match microbench (tile-layout-fixed kernels) ---"
timeout 2400 python scripts/match_microbench.py \
  --na 2048 --nb 8192 --batch 8 --reps 10 \
  --json-out "$R/r3_matchmb2_chip.json" > "$R/r3_matchmb2_chip.log" 2>&1
echo "rc=$? $(date)"; grep -E "pallas|probe" "$R/r3_matchmb2_chip.log" | head -8

echo "--- [3/5] stage profile (taps, pairs=8, robust stack stage) ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='taps'" \
  --json-out "$R/r3_stages_taps.json" > "$R/r3_stages_taps.log" 2>&1
echo "rc=$? $(date)"; grep -E "stage|sum_of" "$R/r3_stages_taps.log" | head -12

echo "--- [4/5] mv8 eval with pose-graph GN ---"
timeout 2700 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v4 --set "match.num_corr=2048" \
  --json-out "$R/r3_mv8_v4_gn.json" > "$R/r3_mv8_v4_gn.log" 2>&1
echo "rc=$? $(date)"; grep -E "median|scene" "$R/r3_mv8_v4_gn.log" | tail -5

echo "--- [5/5] mv30 eval with pose-graph GN ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v4 --set "match.num_corr=2048" \
  --json-out "$R/r3_mv30_v4_gn.json" > "$R/r3_mv30_v4_gn.log" 2>&1
echo "rc=$? $(date)"; grep -E "median|scene|ecdf" "$R/r3_mv30_v4_gn.log" | tail -5

echo "=== r3 queue2 done $(date) ==="
