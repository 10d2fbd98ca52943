#!/bin/bash
# Round-4 chip queue #5: close the rot@3 gap (winner-only plane iters),
# re-run official if the default changes.
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r4 queue5 start $(date) ==="

for PI in 3 4; do
echo "--- mv30 v8k19 icp_plane_iters=$PI ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --set "match.icp_plane_iters=$PI" \
  --json-out "$R/r4_mv30_pi$PI.json" > "$R/r4_mv30_pi$PI.log" 2>&1
echo "rc=$? $(date)"
python -c "
import json; d=json.load(open('$R/r4_mv30_pi$PI.json'))
print('pi$PI mean_rot', round(d['mean_rot_deg'],2), 'rot@3', round(d['rot_ecdf']['3.0'],3), 'trans@5cm', round(d['trans_ecdf']['0.05'],3), 'mean_trans', round(d['mean_trans_m'],3))" 2>/dev/null
done

echo "=== r4 queue5 done $(date) ==="
