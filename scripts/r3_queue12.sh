#!/bin/bash
# Round-3 queue #12: batch-scale A/B now that the strided verifier
# slashed peak HBM (the r3 pairs=16 OOM predates it), plus a
# right-sized-capacity variant (L2/L3 run 2-4x oversized for 16k-point
# fragments: actual 1004/267 voxels vs 2048/1024 capacity).
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r3 queue12 start $(date) ==="
while ! grep -q "r3 queue11 done" "$R/r3_queue11.log" 2>/dev/null; do sleep 30; done

echo "--- [1/2] bench pairs=16 ---"
MVREG_BENCH_PAIRS=16 timeout 3600 python bench.py > "$R/r3_bench_v2_p16.log" 2>&1
echo "rc=$?"; grep '^{' "$R/r3_bench_v2_p16.log" | tail -1

echo "--- [2/2] bench pairs=8, right-sized L2/L3 capacities (informational) ---"
MVREG_BENCH_CAPS=tight timeout 3600 python bench.py > "$R/r3_bench_v2_tightcaps.log" 2>&1
echo "rc=$?"; grep '^{' "$R/r3_bench_v2_tightcaps.log" | tail -1
echo "=== r3 queue12 done $(date) ==="
