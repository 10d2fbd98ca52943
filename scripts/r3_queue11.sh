#!/bin/bash
# Round-3 queue #11: validate the rank-join plan + strided-verification
# edge program on chip, re-bench, accuracy A/B, then the queue9 legs.
cd /root/repo
R=runs/results
exec 2>&1
echo "=== r3 queue11 start $(date) ==="

echo "--- [1/6] chain_prof plan+edges with new code ---"
timeout 3600 python scripts/chain_prof.py --probe plan,edges --pairs 8 \
  --json-out "$R/r3_chainprof2.json" > "$R/r3_chainprof2.log" 2>&1
echo "rc=$? $(date)"; tail -16 "$R/r3_chainprof2.log"

echo "--- [2/6] bench official (taps+symjoin) ---"
timeout 3600 python bench.py > "$R/r3_bench_v2_sym.log" 2>&1
echo "rc=$?"; grep '^{' "$R/r3_bench_v2_sym.log" | tail -1

echo "--- [3/6] bench with plain sortjoin (full rank join) ---"
MVREG_LOOKUP=sortjoin timeout 3600 python bench.py > "$R/r3_bench_v2_plain.log" 2>&1
echo "rc=$?"; grep '^{' "$R/r3_bench_v2_plain.log" | tail -1

echo "--- [4/6] mv8 accuracy A/B (flagship, stride verification) ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v7_presync \
  --set "match.num_corr=2048" --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv8_stride.json" > "$R/r3_mv8_stride.log" 2>&1
echo "rc=$?"; python - <<'PY'
import json
try:
    d = json.load(open('runs/results/r3_mv8_stride.json'))
    print({k: d.get(k) for k in ('median_rot_deg','mean_rot_deg','mean_trans_m','num_pairs')})
except Exception as e:
    print('no json', e)
PY

echo "--- [5/6] mv30 accuracy A/B ---"
timeout 3000 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync \
  --set "match.num_corr=2048" --set "sync.pose_gn_iters=0" \
  --json-out "$R/r3_mv30_stride.json" > "$R/r3_mv30_stride.log" 2>&1
echo "rc=$?"; python - <<'PY'
import json
try:
    d = json.load(open('runs/results/r3_mv30_stride.json'))
    print({k: d.get(k) for k in ('median_rot_deg','mean_rot_deg','mean_trans_m','num_pairs')})
except Exception as e:
    print('no json', e)
PY

echo "--- [6/6] queue9 legs (flagship recall full8 + 4096 probe) ---"
bash scripts/r3_queue9.sh
echo "=== r3 queue11 done $(date) ==="
