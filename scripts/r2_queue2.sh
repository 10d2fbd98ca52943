#!/bin/sh
# Round-2 chip queue 2 (run AFTER r2_queue1b.sh has exited):
#   (a) Pallas fused-gather conv on-chip validation + microbench
#       (VERDICT item 9 / ADVICE high — round 1 never lowered on TPU);
#   (b) per-stage FLOPs/MFU table at bench scale (VERDICT item 4);
#   (c) ICP-polish A/B on the v5 checkpoint (8- and 30-fragment).
# Same rules: sequential, per-step + whole-script timeouts, no polling.
set -x
cd /root/repo
R=runs/results
CK=runs/synth_v5

timeout 3600 python scripts/conv_microbench.py --cin 32 --cout 32 \
  --voxels 8192 > $R/r2_convmb_l0.log 2>&1
timeout 1800 python scripts/conv_microbench.py --cin 128 --cout 128 \
  --voxels 2048 > $R/r2_convmb_l2.log 2>&1

timeout 2400 python scripts/profile_stages.py --points 16384 --pairs 4 \
  --reps 3 --json-out $R/r2_stage_mfu.json > $R/r2_stage_mfu.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt $CK --set "match.icp_iters=4" \
  --json-out $R/r2_mv8_v5_icp.json > $R/r2_mv8_v5_icp.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 1 \
  --fragments 30 --points 6144 --ckpt $CK --set "match.icp_iters=4" \
  --json-out $R/r2_mv30_v5_icp.json > $R/r2_mv30_v5_icp.log 2>&1

timeout 1800 python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
  --points 6144 --ckpt $CK --set "match.icp_iters=4" \
  --json-out $R/r2_recall_v5_icp.json > $R/r2_recall_v5_icp.log 2>&1

echo QUEUE2_DONE
