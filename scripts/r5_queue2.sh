#!/bin/bash
# Round-5 chip queue #2: benches at current code (k19 + k7 tiers, both
# with the honest per-program CPU baselines and the new bandwidth
# roofline fields), mv30 on the recalibrated v8k19c, then the
# crash-prone legs LAST (round-3 lesson): the fused-match chip probe
# and the official-bench-shaped run at match.backend=auto.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r5 queue2 start $(date) ==="

echo "--- [1/7] official bench, current defaults (k19) ---"
timeout 5400 python bench.py > "$R/r5_bench_official_k19.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r5_bench_official_k19.log"

echo "--- [2/7] bench k7 tier (fresh code, cached k7 CPU baseline) ---"
MVREG_TAPS=7 timeout 5400 python bench.py > "$R/r5_bench_k7.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r5_bench_k7.log"

echo "--- [3/7] mv30 v8k19c (recalibrated confidence, sync-heavy eval) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19c \
  --json-out "$R/r5_mv30_v8k19c.json" > "$R/r5_mv30_v8k19c.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v8k19c.log" | tail -3

echo "--- [4/7] mv8 v9k7 at num_corr=2048 (headline condition check) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt runs/synth_v9k7 --set "match.num_corr=2048" \
  --json-out "$R/r5_mv8_v9k7_2048.json" > "$R/r5_mv8_v9k7_2048.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv8_v9k7_2048.log" | tail -3

echo "--- [5/7] fused-match chip probe (parity + marginal timing) ---"
timeout 2400 python scripts/match_fused_probe.py \
  --json-out "$R/r5_match_fused_probe.json" \
  > "$R/r5_match_fused_probe.log" 2>&1
echo "rc=$? $(date)"; tail -5 "$R/r5_match_fused_probe.log"

echo "--- waiting 120 s before the crash-prone leg ---"
sleep 120

echo "--- [6/7] bench-shaped run at match.backend=auto (FUSED pallas) ---"
MVREG_MATCH_BACKEND=auto MVREG_PALLAS_FUSED=1 MVREG_SKIP_CPU_BASELINE=1 \
  timeout 3600 python bench.py > "$R/r5_bench_match_auto_fused.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r5_bench_match_auto_fused.log"

echo "--- waiting 120 s before the second crash-prone leg ---"
sleep 120

echo "--- [7/7] bench-shaped run at match.backend=auto (two-pass pallas) ---"
MVREG_MATCH_BACKEND=auto MVREG_SKIP_CPU_BASELINE=1 timeout 3600 \
  python bench.py > "$R/r5_bench_match_auto.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r5_bench_match_auto.log"

echo "=== r5 queue2 done $(date) ==="
