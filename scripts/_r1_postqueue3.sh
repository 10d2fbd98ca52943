#!/bin/sh
# Stage 3: re-run the trained pairwise benchmark (its first run was
# killed to stop it restoring the NaN step-10800 checkpoint).
set -x
cd /root/repo
while [ ! -f runs/results/postqueue2_done ]; do sleep 30; done

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v3 \
  --json-out runs/results/recall_trained.json \
  > runs/results/bench_pairwise_trained.log 2>&1

echo DONE > runs/results/postqueue3_done
