#!/bin/sh
# Stage 4: re-run the two measurements that hit the transient
# opt_state-structure restore mismatch (fixed in train/state.py).
set -x
cd /root/repo
while [ ! -f runs/results/postqueue3_done ]; do sleep 30; done

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v3 --no-filter \
  --json-out runs/results/recall_nofilter.json \
  > runs/results/bench_pairwise_nofilter.log 2>&1

timeout 1800 python scripts/diagnose_pair.py --ckpt runs/synth_v3 \
  --points 6144 --seeds 0 1 100 101 102 \
  --json-out runs/results/diag_final.json \
  > runs/results/diag_final.log 2>&1

echo DONE > runs/results/postqueue4_done
