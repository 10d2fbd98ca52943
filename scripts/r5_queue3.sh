#!/bin/bash
# Round-5 queue #3: the v9k7 mv30-collapse bisect. v9k7's fresh
# config.yaml carries SCHEMA sync defaults (overlap_floor 0.15,
# refine_iters 2) where every stable flagship yaml carries the round-3
# chip-tuned values (0.3, 1). recall8 (pairwise; 0.853) and diag
# (inlier 0.333, neg-conf 0.071) say the k7 descriptor is the best
# yet, so if the tuned sync profile fixes mv30 the collapse was config
# drift and the 103 fr/s tier ships.
cd /root/repo
R=runs/results
CK=runs/synth_v9k7
exec 2>&1

echo "=== r5 queue3 start $(date) ==="

echo "--- [1/4] mv30 v9k7 + flagship sync profile (floor .3, refine 1) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK \
  --set "sync.overlap_floor=0.3" --set "sync.refine_iters=1" \
  --json-out "$R/r5_mv30_v9k7_tuned.json" > "$R/r5_mv30_v9k7_tuned.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v9k7_tuned.log" | tail -2

echo "--- [2/4] mv30 v9k7 floor-only (floor .3, refine 2) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK \
  --set "sync.overlap_floor=0.3" \
  --json-out "$R/r5_mv30_v9k7_floor.json" > "$R/r5_mv30_v9k7_floor.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v9k7_floor.log" | tail -2

echo "--- [3/4] mv30 v9k7 refine-only (floor .15, refine 1) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt $CK \
  --set "sync.refine_iters=1" \
  --json-out "$R/r5_mv30_v9k7_refine.json" > "$R/r5_mv30_v9k7_refine.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv30_v9k7_refine.log" | tail -2

echo "--- [4/4] mv8 v9k7 + flagship sync profile ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt $CK \
  --set "sync.overlap_floor=0.3" --set "sync.refine_iters=1" \
  --json-out "$R/r5_mv8_v9k7_tuned.json" > "$R/r5_mv8_v9k7_tuned.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r5_mv8_v9k7_tuned.log" | tail -2

echo "=== r5 queue3 done $(date) ==="
