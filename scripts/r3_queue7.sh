#!/bin/bash
# Round-3 chip queue #7: flagship decision — presync checkpoint with the
# shipping defaults (GN off), plus its descriptor-quality probe.
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r3 queue7 start $(date) ==="

echo "--- [1/3] mv30 presync, shipping defaults ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r3_mv30_presync_nogn.json" > "$R/r3_mv30_presync_nogn.log" 2>&1
echo "rc=$? $(date)"; grep -E "ECDF|mean rot" "$R/r3_mv30_presync_nogn.log" | tail -3

echo "--- [2/3] mv8 presync, shipping defaults ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --json-out "$R/r3_mv8_presync_nogn.json" > "$R/r3_mv8_presync_nogn.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean rot" "$R/r3_mv8_presync_nogn.log" | tail -1

echo "--- [3/3] presync descriptor probe ---"
timeout 2400 python scripts/diagnose_pair.py --ckpt runs/synth_v7_presync \
  --points 6144 --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
  --json-out "$R/r3_diag_presync.json" > "$R/r3_diag_presync.log" 2>&1
echo "rc=$? $(date)"; grep -E "inlier" "$R/r3_diag_presync.log" | tail -1
echo "=== r3 queue7 done $(date) ==="
