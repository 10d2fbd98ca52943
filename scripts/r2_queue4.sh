#!/bin/sh
# Round-2 chip queue 4 (after r2_queue3.sh): isolate the mv8 tail
# difference (v6-chip 73% @45 vs v4-cpu 100% @45) — checkpoint or
# platform? — then the official bench as the last chip job of the
# round (leaves a warm, healthy relay for the driver's run).
set -x
cd /root/repo
R=runs/results

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v4 --json-out $R/r2_mv8_v4_chip.json \
  > $R/r2_mv8_v4_chip.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt runs/synth_v4 \
  --json-out $R/r2_mv30_v4_chip.json > $R/r2_mv30_v4_chip.log 2>&1

timeout 1200 python bench.py > $R/r2_bench_final.log 2>&1

echo QUEUE4_DONE
