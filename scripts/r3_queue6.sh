#!/bin/bash
# Round-3 chip queue #6: the im2col brick A/B (the lax.conv windowed
# form measured 1.9% MFU; this is the same contraction as one MXU GEMM).
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r3 queue6 start $(date) ==="

echo "--- [1/2] stage profile: BRICK im2col ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='brick'" \
  --json-out "$R/r3_stages_brick2.json" > "$R/r3_stages_brick2.log" 2>&1
echo "rc=$? $(date)"; grep -E "1_voxelize|2_unet|7_edges|sum_of" "$R/r3_stages_brick2.log" | head -4

# (brick bench dropped: the full chained bench program faults the chip
# with INVALID_ARGUMENT after warmup at pairs>=8 — memory-pattern issue
# recorded in RESULTS; the stage profile above isolates the UNet.)
echo "=== r3 queue6 done $(date) ==="
