#!/bin/bash
# Round-4 chip queue #2: benches at CURRENT code (L1 normals), plane
# cost control, cycle-gate recall A/B, and the Pallas-match fault
# bisect (crash-prone legs LAST).
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r4 queue2 start $(date) ==="

echo "--- [1/8] bench k27 current code (isolates normals cost vs r3) ---"
MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k27_cur.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k27_cur.log"

echo "--- [2/8] bench k27 plane OFF (cost control) ---"
MVREG_PLANE=0 MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k27_noplane.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k27_noplane.log"

echo "--- [3/8] bench k19 current code ---"
MVREG_TAPS=19 MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k19_cur.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k19_cur.log"

echo "--- [4/8] bench k7 current code ---"
MVREG_TAPS=7 MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k7_cur.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k7_cur.log"

echo "--- [5/8] recall8 v7_presync, cycle gate ON (new default) ---"
timeout 4800 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync \
  --json-out "$R/r4_recall8_cyc.json" > "$R/r4_recall8_cyc.log" 2>&1
echo "rc=$? $(date)"; grep -oE '"mean_recall[^,]*' "$R/r4_recall8_cyc.json" | head -2

echo "--- [6/8] mv30 v8k19 (sparse-support flagship candidate) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --json-out "$R/r4_mv30_v8k19.json" > "$R/r4_mv30_v8k19.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_v8k19.log" | tail -3

echo "--- [7/8] bf16 matching A/B on mv8 (pallas default precision) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --set "match.pallas_precision='default'" \
  --json-out "$R/r4_mv8_bf16match.json" > "$R/r4_mv8_bf16match.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv8_bf16match.log" | tail -3

echo "--- [8/8] Pallas-match fault bisect (crash-prone; LAST) ---"
# Progressive program size: backend=pallas, growing chain/batch. Each
# leg in a fresh process; sleep lets a faulted worker recover.
for CFGV in "1 1" "1 5" "4 5" "8 1" "8 5"; do
  set -- $CFGV
  PAIRS=$1; ITERS=$2
  MVREG_MATCH_BACKEND=pallas MVREG_BENCH_PAIRS=$PAIRS \
    MVREG_BENCH_ITERS=$ITERS MVREG_BENCH_RETRY=1 \
    MVREG_SKIP_CPU_BASELINE=1 timeout 2400 python bench.py \
    > "$R/r4_matchfault_p${PAIRS}_i${ITERS}.log" 2>&1
  RC=$?
  echo "pairs=$PAIRS iters=$ITERS rc=$RC $(date)"
  tail -1 "$R/r4_matchfault_p${PAIRS}_i${ITERS}.log"
  sleep 90
done

echo "=== r4 queue2 done $(date) ==="
