#!/bin/bash
# Round-3 chip queue #8: presync GN-off evals (the checkpoint-carried
# config had pose_gn_iters:6 baked in, so queue5/7's "default" runs
# were GN-on; --set makes it explicit), then the official bench retry
# on a rested chip as the LAST job.
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r3 queue8 start $(date) ==="

echo "--- [1/3] mv30 presync GN-off (explicit) ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv30_presync_nogn2.json" > "$R/r3_mv30_presync_nogn2.log" 2>&1
echo "rc=$? $(date)"; grep -E "ECDF|mean rot" "$R/r3_mv30_presync_nogn2.log" | tail -3

echo "--- [2/3] mv8 presync GN-off (explicit) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv8_presync_nogn2.json" > "$R/r3_mv8_presync_nogn2.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean rot" "$R/r3_mv8_presync_nogn2.log" | tail -1

echo "--- [3/3] official bench retry (rested chip) ---"
sleep 300
timeout 3600 python bench.py > "$R/r3_bench_official2.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_official2.log" | head -c 300; echo
echo "=== r3 queue8 done $(date) ==="
