#!/bin/sh
# Stage 6: scan-amortized conv-schedule A/B — the plain A/B was swamped
# by the relay's ~315 ms dispatch floor (fused and dense measured equal).
set -x
cd /root/repo
while [ ! -f runs/results/postqueue5_done ]; do sleep 30; done

timeout 3600 python scripts/descriptor_bench.py --impls fused,taps,dense \
  --scan-iters 8 --json-out runs/results/descriptor_ab_scan.json \
  > runs/results/descriptor_ab_scan.log 2>&1

timeout 2400 python scripts/descriptor_bench.py --impls fused,dense \
  --points 6144 --voxel-size 0.05 --caps 4096,2048,1024,512 \
  --dense-grid 64,64,64 --scan-iters 8 \
  --json-out runs/results/descriptor_ab_scan_eval.json \
  > runs/results/descriptor_ab_scan_eval.log 2>&1

echo DONE > runs/results/postqueue6_done
