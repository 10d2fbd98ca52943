#!/bin/bash
# Round-3 chip queue #4 (auto-runs after queue3): chained-timing kernel
# microbenches (the per-dispatch protocol sat on the ~28 ms relay
# floor), symjoin voxelize A/B, and the bench-default decision runs.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r3 queue4 start $(date) ==="

echo "--- [1/6] stage profile: taps + symjoin lookup ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='taps'" --set "voxel.lookup='symjoin'" \
  --json-out "$R/r3_stages_symjoin.json" > "$R/r3_stages_symjoin.log" 2>&1
echo "rc=$? $(date)"; grep -E "1_voxelize|2_unet|7_edges|sum_of" "$R/r3_stages_symjoin.log" | head -4

echo "--- [2/6] conv microbench L0, chained timing ---"
timeout 2400 python scripts/conv_microbench.py \
  --batch 8 --voxels 8192 --cin 32 --cout 32 --reps 5 \
  > "$R/r3_convmb3_l0.log" 2>&1
echo "rc=$? $(date)"; grep -E "^(fused|taps|einsum|pallas)" "$R/r3_convmb3_l0.log"

echo "--- [3/6] conv microbench L2, chained timing ---"
timeout 2400 python scripts/conv_microbench.py \
  --batch 8 --voxels 2048 --cin 128 --cout 128 --reps 5 \
  > "$R/r3_convmb3_l2.log" 2>&1
echo "rc=$? $(date)"; grep -E "^(fused|taps|einsum|pallas)" "$R/r3_convmb3_l2.log"

echo "--- [4/6] match tile sweep, chained timing ---"
timeout 3000 python scripts/match_tile_sweep.py \
  --na 2048 --nb 8192 --batch 8 --reps 5 \
  --json-out "$R/r3_match_sweep2.json" > "$R/r3_match_sweep2.log" 2>&1
echo "rc=$? $(date)"; python -c "
import json
d = json.load(open('$R/r3_match_sweep2.json'))
print('xla_ms', d.get('xla_ms'), 'best', d.get('best'))" 2>/dev/null

echo "--- [5/6] bench: taps + symjoin + pairs=8 ---"
MVREG_BENCH_PAIRS=8 MVREG_CONV_IMPL=taps MVREG_LOOKUP=symjoin \
  timeout 3600 python bench.py > "$R/r3_bench_p8_taps_sym.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_p8_taps_sym.log"

echo "--- [6/6] bench: pairs=16 with best settings ---"
MVREG_BENCH_PAIRS=16 MVREG_CONV_IMPL=taps MVREG_LOOKUP=symjoin \
  timeout 3600 python bench.py > "$R/r3_bench_p16_taps_sym.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_p16_taps_sym.log"

echo "=== r3 queue4 done $(date) ==="

echo "--- [7/7] gather scaling probe (brick-conv decision) ---"
timeout 1800 python scripts/gather_scaling_probe.py > "$R/r3_gather_probe.log" 2>&1
echo "rc=$? $(date)"; grep gather "$R/r3_gather_probe.log" | head -6

echo "--- [8/9] stage profile: BRICK schedule ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='brick'" \
  --json-out "$R/r3_stages_brick.json" > "$R/r3_stages_brick.log" 2>&1
echo "rc=$? $(date)"; grep -E "1_voxelize|2_unet|7_edges|sum_of" "$R/r3_stages_brick.log" | head -4

echo "--- [9/9] bench: brick schedule, pairs=8 ---"
MVREG_BENCH_PAIRS=8 MVREG_CONV_IMPL=brick timeout 3600 python bench.py \
  > "$R/r3_bench_p8_brick.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_p8_brick.log"
