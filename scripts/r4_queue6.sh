#!/bin/bash
# Round-4 chip queue #6: final default combo + headline set at it.
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r4 queue6 start $(date) ==="

echo "--- mv30 v8k19 iters=3 + scene rounds=2 (combo) ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --set "match.icp_plane_iters=3" --set "sync.scene_icp_plane_rounds=2" \
  --json-out "$R/r4_mv30_combo.json" > "$R/r4_mv30_combo.log" 2>&1
echo "rc=$? $(date)"
python -c "
import json; d=json.load(open('$R/r4_mv30_combo.json'))
print('combo mean_rot', round(d['mean_rot_deg'],2), 'rot@3', round(d['rot_ecdf']['3.0'],3), 'trans@5cm', round(d['trans_ecdf']['0.05'],3), 'mean_trans', round(d['mean_trans_m'],3))" 2>/dev/null

echo "--- mv8 v8k19 at final defaults (iters=3) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --set "match.icp_plane_iters=3" \
  --json-out "$R/r4_mv8_final.json" > "$R/r4_mv8_final.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean rot" "$R/r4_mv8_final.log" | tail -1

echo "--- recall8 v8k19 at final defaults (iters=3) ---"
timeout 4800 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.icp_plane_iters=3" \
  --json-out "$R/r4_recall8_final.json" > "$R/r4_recall8_final.log" 2>&1
echo "rc=$? $(date)"
python -c "import json;d=json.load(open('$R/r4_recall8_final.json'));print('mean recall', round(d['recall']['mean'],3))" 2>/dev/null

echo "--- OFFICIAL bench re-run at icp_plane_iters=3 default ---"
timeout 3000 python bench.py > "$R/r4_bench_official_pi3.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_official_pi3.log"

echo "=== r4 queue6 done $(date) ==="
