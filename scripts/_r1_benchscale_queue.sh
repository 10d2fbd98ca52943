#!/bin/sh
# After the pallas-conv A/B: probe whether a larger per-step batch lifts
# the official fragments/s/chip number (fixed per-step overheads
# amortize over more fragments; the CPU baseline re-measures at the same
# scale via the per-scale cache, so vs_baseline stays apples-to-apples).
set -x
cd /root/repo
R=runs/results
while [ ! -f $R/pallasconv_done ]; do sleep 30; done

MVREG_BENCH_PAIRS=8 timeout 2400 python bench.py \
  > $R/bench_pairs8.log 2>&1
MVREG_BENCH_PAIRS=16 timeout 2400 python bench.py \
  > $R/bench_pairs16.log 2>&1

touch $R/benchscale_done
