#!/bin/bash
# Round-5 queue #4: post-fix validation of the degree-normalized
# spectral sync (commit 05ad797). Runs AFTER queue2 (whose last legs
# are crash-prone pallas exposures): recovery idle first, then the
# must-succeed evals.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r5 queue4 start $(date) ==="
echo "--- recovery idle 300 s (queue2 ends with crash-prone legs) ---"
sleep 300

echo "--- [1/4] mv30 v9k7 POST-FIX (yaml profile: floor .15, refine 2) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v9k7 \
  --json-out "$R/r5_mv30_v9k7_fix.json" > "$R/r5_mv30_v9k7_fix.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v9k7_fix.log" | tail -2

echo "--- [2/4] mv30 v9k7 POST-FIX tuned profile (floor .3, refine 1) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v9k7 \
  --set "sync.overlap_floor=0.3" --set "sync.refine_iters=1" \
  --json-out "$R/r5_mv30_v9k7_fix_tuned.json" \
  > "$R/r5_mv30_v9k7_fix_tuned.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v9k7_fix_tuned.log" | tail -2

echo "--- [3/4] mv8 v9k7 POST-FIX (yaml profile) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt runs/synth_v9k7 \
  --json-out "$R/r5_mv8_v9k7_fix.json" > "$R/r5_mv8_v9k7_fix.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv8_v9k7_fix.log" | tail -2

echo "--- [4/4] mv30 v8k19 POST-FIX no-regression (defaults-exact) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 \
  --json-out "$R/r5_mv30_v8k19_fix.json" > "$R/r5_mv30_v8k19_fix.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v8k19_fix.log" | tail -2

echo "=== r5 queue4 done $(date) ==="
