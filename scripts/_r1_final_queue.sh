#!/bin/sh
# Last round-1 chip stage: v4 evals at the measured-best eval settings
# (num_corr=2048 lifted low-overlap recall 0.2->0.35 on v3).
set -x
cd /root/repo
R=runs/results
while [ ! -f $R/benchscale_done ]; do sleep 30; done

timeout 1800 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v4 --set "match.num_corr=2048" \
  --json-out $R/recall_v4_2048.json > $R/bench_pairwise_v4_2048.log 2>&1

timeout 1800 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v4 --set "match.num_corr=2048" \
  --set "match.estimator=ransac" \
  --json-out $R/mv30_v4_ransac.json > $R/bench_mv30_v4_ransac.log 2>&1

touch $R/final_queue_done
