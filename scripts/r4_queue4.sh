#!/bin/bash
# Round-4 chip queue #4: FINAL headline set at shipping defaults
# (kernel_taps=19, plane ICP, cycle gate, v8k19 extended-tune).
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r4 queue4 start $(date) ==="

echo "--- [1/5] OFFICIAL bench (shipping defaults; fresh CPU baseline) ---"
python - <<'PYEOF'
import json
d = json.load(open("BENCH_CPU_BASELINE.json"))
d.pop("16384x8-k19", None)
json.dump(d, open("BENCH_CPU_BASELINE.json", "w"))
PYEOF
timeout 5400 python bench.py > "$R/r4_bench_official.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_official.log"

echo "--- [2/5] recall8 v8k19 (defaults-exact headline) ---"
timeout 4800 python scripts/benchmark_pairwise.py --scenes 8 --fragments 8 \
  --points 6144 --ckpt runs/synth_v8k19 \
  --json-out "$R/r4_recall8_v8k19.json" > "$R/r4_recall8_v8k19.log" 2>&1
echo "rc=$? $(date)"
python -c "import json;d=json.load(open('$R/r4_recall8_v8k19.json'));print('mean recall', d['recall']['mean'])" 2>/dev/null

echo "--- [3/5] mv8 v8k19 ---"
timeout 2400 python scripts/benchmark_multiview.py --scenes 1 --fragments 8 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --json-out "$R/r4_mv8_v8k19.json" > "$R/r4_mv8_v8k19.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv8_v8k19.log" | tail -2

echo "--- [4/5] diag v8k19 post-extended-tune (calibration check) ---"
timeout 2400 python scripts/diagnose_pair.py --ckpt runs/synth_v8k19 \
  --points 6144 --seeds 0 1 100 101 102 --negative-seeds 0 1 2 \
  --json-out "$R/r4_diag_v8k19b.json" > "$R/r4_diag_v8k19b.log" 2>&1
echo "rc=$? $(date)"
python -c "import json;d=json.load(open('$R/r4_diag_v8k19b.json'));print({k:round(v,3) for k,v in d.items() if isinstance(v,(int,float))})" 2>/dev/null

echo "--- [4b] mv30 v8k19 DEFAULTS-EXACT (winner-only plane polish) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --json-out "$R/r4_mv30_flagship.json" > "$R/r4_mv30_flagship.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_flagship.log" | tail -2

echo "--- [5/5] mv30 v8k19 plane_rounds=2 (chase the last trans cells) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --set "sync.scene_icp_plane_rounds=2" \
  --json-out "$R/r4_mv30_v8k19_pl2.json" > "$R/r4_mv30_v8k19_pl2.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_v8k19_pl2.log" | tail -2

echo "=== r4 queue4 done $(date) ==="
