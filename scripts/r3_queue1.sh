#!/bin/bash
# Round-3 chip queue #1: Pallas-on-chip evidence + bench batch scaling.
# Sequential (the axon relay is single-client); generous per-step
# timeouts sized so steps FINISH (a killed chip process costs the next
# claim up to ~27 min — round-2 operational fact).
cd /root/repo
R=runs/results
mkdir -p "$R"
exec 2>&1

echo "=== r3 queue1 start $(date) ==="

echo "--- [1/5] match microbench (Pallas vs XLA, compiled on chip) ---"
timeout 2400 python scripts/match_microbench.py \
  --na 2048 --nb 8192 --batch 8 --reps 10 \
  --json-out "$R/r3_matchmb_chip.json" > "$R/r3_matchmb_chip.log" 2>&1
echo "rc=$? $(date)"; tail -3 "$R/r3_matchmb_chip.log"

echo "--- [2/5] match microbench again (compile-cache probe) ---"
timeout 1800 python scripts/match_microbench.py \
  --na 2048 --nb 8192 --batch 8 --reps 10 \
  --json-out "$R/r3_matchmb_chip2.json" > "$R/r3_matchmb_chip2.log" 2>&1
echo "rc=$? $(date)"; grep -E "probe|compile" "$R/r3_matchmb_chip2.log" | head -8

echo "--- [3/5] conv microbench (pallas retry at L0 scale) ---"
timeout 2400 python scripts/conv_microbench.py \
  --batch 8 --voxels 8192 --cin 32 --cout 32 \
  > "$R/r3_convmb_l0.log" 2>&1
echo "rc=$? $(date)"; tail -6 "$R/r3_convmb_l0.log"

echo "--- [4/5] bench.py pairs=8 (fused, robust stack on) ---"
MVREG_BENCH_PAIRS=8 timeout 3000 python bench.py \
  > "$R/r3_bench_p8.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r3_bench_p8.log"

echo "--- [5/5] bench.py pairs=8 taps schedule ---"
MVREG_BENCH_PAIRS=8 MVREG_CONV_IMPL=taps timeout 3600 python bench.py \
  > "$R/r3_bench_p8_taps.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r3_bench_p8_taps.log"

echo "=== r3 queue1 done $(date) ==="
