#!/bin/sh
# After the v4 fine-tune queue: A/B the new fused-gather Pallas conv
# schedule (ops/pallas/sparse_conv_gather.py) on the real chip —
# kernel-level microbench at two level shapes, then the descriptor-stage
# bench, then the official bench if it looks competitive.
set -x
cd /root/repo
R=runs/results
while [ ! -f $R/finetune_v4_done ]; do sleep 30; done

timeout 1800 python scripts/conv_microbench.py --cin 32 --cout 32 \
  --voxels 8192 > $R/convmb_pallas_l0.log 2>&1
timeout 1800 python scripts/conv_microbench.py --cin 128 --cout 128 \
  --voxels 2048 > $R/convmb_pallas_l2.log 2>&1

timeout 2400 python scripts/descriptor_bench.py \
  --impls fused,taps,pallas --scan-iters 5 \
  --json-out $R/descriptor_ab_pallas.json > $R/descriptor_ab_pallas.log 2>&1

MVREG_CONV_IMPL=pallas timeout 1800 python bench.py \
  > $R/bench_pallas_full.log 2>&1

touch $R/pallasconv_done
