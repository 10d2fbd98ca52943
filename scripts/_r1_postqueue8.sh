#!/bin/sh
# Stage 8: pairwise-recall ablations on the trained checkpoint - the
# recall pairs are non-consecutive (low-overlap); probe the robust
# estimator and a larger putative set.
set -x
cd /root/repo
while [ ! -f runs/results/postqueue7_done ]; do sleep 30; done

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v3 \
  --set "match.estimator='ransac'" \
  --json-out runs/results/recall_ransac.json \
  > runs/results/bench_pairwise_ransac.log 2>&1

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v3 \
  --set "match.num_corr=2048" \
  --json-out runs/results/recall_2048.json \
  > runs/results/bench_pairwise_2048.log 2>&1

timeout 2400 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt runs/synth_v3 \
  --set "match.estimator='ransac'" --set "match.num_corr=2048" \
  --set "match.ransac_hypotheses=1024" \
  --json-out runs/results/recall_ransac2048.json \
  > runs/results/bench_pairwise_ransac2048.log 2>&1

echo DONE > runs/results/postqueue8_done
