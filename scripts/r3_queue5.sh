#!/bin/bash
# Round-3 chip queue #5 (final): config-3 8-scene recall on stand-ins,
# best-checkpoint confirmation runs, and the official-defaults bench as
# the last chip job (leaves a warm healthy relay for the driver).
# Usage: bash scripts/r3_queue5.sh [CKPT]   (default runs/synth_v7)
cd /root/repo
R=runs/results
CK=${1:-runs/synth_v7}
exec 2>&1

echo "=== r3 queue5 start $(date) ckpt=$CK ==="

echo "--- [1/3] config-3: 8-scene overlap-filtered recall (stand-ins) ---"
timeout 5400 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --json-out "$R/r3_recall_full8.json" > "$R/r3_recall_full8.log" 2>&1
echo "rc=$? $(date)"; tail -4 "$R/r3_recall_full8.log"

echo "--- [2a/4] GN on/off ablation: mv8 ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv8_final_nogn.json" > "$R/r3_mv8_final_nogn.log" 2>&1
echo "rc=$? $(date)"; grep -E "median|mean rot" "$R/r3_mv8_final_nogn.log" | tail -2

echo "--- [2b/4] mv30 with the best checkpoint (GN on) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 2 --fragments 30 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --json-out "$R/r3_mv30_final.json" > "$R/r3_mv30_final.log" 2>&1
echo "rc=$? $(date)"; grep -E "median|ECDF|translation" "$R/r3_mv30_final.log" | tail -3

echo "--- [2c/4] mv30 GN off ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 2 --fragments 30 \
  --points 6144 --ckpt "$CK" --set "match.num_corr=2048" \
  --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv30_final_nogn.json" > "$R/r3_mv30_final_nogn.log" 2>&1
echo "rc=$? $(date)"; grep -E "median|ECDF|translation" "$R/r3_mv30_final_nogn.log" | tail -3

echo "--- [4/4] official bench at shipped defaults ---"
timeout 3600 python bench.py > "$R/r3_bench_official.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r3_bench_official.log"

echo "=== r3 queue5 done $(date) ==="
