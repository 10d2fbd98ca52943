#!/bin/bash
# Round-4 chip queue #3: candidate-default evals + final official bench.
# CK/TAPS chosen from queue2 results (v8k19 vs v8k7 accuracy).
cd /root/repo
R=runs/results
exec 2>&1

echo "=== r4 queue3 start $(date) ==="

echo "--- [0] pallas-match scan repro (mosaic_probe3) ---"
sleep 60  # let the worker recover from the bisect faults
timeout 1800 python scripts/mosaic_probe3.py > "$R/r4_mosaic_probe3.log" 2>&1
echo "rc=$? $(date)"; grep probe3 "$R/r4_mosaic_probe3.log"
sleep 60

echo "--- [1/8] v8k19 extended descriptor fine-tune (+4500 more) ---"
timeout 7200 python scripts/train.py --stage descriptor --steps 32000 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k19 --resume \
  --log-every 200 \
  --set "train.learning_rate=1.5e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.2" \
  --set "train.world_richness='v2'" --set "train.negative_fraction=0" \
  --set "train.checkpoint_every=1000" \
  > "$R/r4_train_desc_k19b.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r4_train_desc_k19b.log"
timeout 3600 python scripts/train.py --stage filter --steps 33500 \
  --points 6144 --pool-pairs 1024 --ckpt-dir runs/synth_v8k19 --resume \
  --log-every 200 \
  --set "train.learning_rate=2e-4" \
  --set "train.shift_min=0.3" --set "train.shift_max=1.5" \
  --set "train.negative_fraction=0.3" \
  --set "train.world_richness='v2'" \
  --set "train.checkpoint_every=500" \
  > "$R/r4_train_filter_k19b.log" 2>&1
echo "rc=$? $(date)"; tail -2 "$R/r4_train_filter_k19b.log"

echo "--- [2/8] mv30 v8k19 after extended tune ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k19 --set "match.num_corr=2048" \
  --json-out "$R/r4_mv30_v8k19b.json" > "$R/r4_mv30_v8k19b.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_v8k19b.log" | tail -2

echo "--- [2b] mv30 v8k7 (best negative-confidence calibration) ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v8k7 --set "match.num_corr=2048" \
  --json-out "$R/r4_mv30_v8k7.json" > "$R/r4_mv30_v8k7.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_v8k7.log" | tail -2

echo "--- [3/8] bench k27 re-measure (gather-free normals plane cost) ---"
MVREG_SKIP_CPU_BASELINE=1 timeout 3000 python bench.py \
  > "$R/r4_bench_k27_cheap.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k27_cheap.log"

echo "--- [4/8] mv30 v7_presync scene_icp_plane_rounds=2 + plane_iters=4 ---"
timeout 3600 python scripts/benchmark_multiview.py --scenes 1 --fragments 30 \
  --points 6144 --ckpt runs/synth_v7_presync --set "match.num_corr=2048" \
  --set "sync.scene_icp_plane_rounds=2" \
  --json-out "$R/r4_mv30_pl2.json" > "$R/r4_mv30_pl2.log" 2>&1
echo "rc=$? $(date)"; grep -E "mean|median" "$R/r4_mv30_pl2.log" | tail -2

echo "--- [5/8] bench pairs=16 at k7 ---"
MVREG_TAPS=7 MVREG_BENCH_PAIRS=16 MVREG_SKIP_CPU_BASELINE=1 \
  timeout 3000 python bench.py > "$R/r4_bench_k7_p16.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k7_p16.log"

echo "--- [6/8] bench k7 + symjoin lookup A/B ---"
MVREG_TAPS=7 MVREG_LOOKUP=symjoin MVREG_SKIP_CPU_BASELINE=1 \
  timeout 3000 python bench.py > "$R/r4_bench_k7_sym.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_k7_sym.log"

echo "--- [7/8] stage profile at k7 defaults (attribution) ---"
timeout 2400 python scripts/profile_stages.py --pairs 8 --reps 3 \
  --set "model.conv_impl='taps'" --set "model.kernel_taps=(7,7,7,7)" \
  --json-out "$R/r4_stages_k7.json" > "$R/r4_stages_k7.log" 2>&1
echo "rc=$? $(date)"; grep -E "voxelize|unet|edges" "$R/r4_stages_k7.log" | head -4

echo "--- [8/8] OFFICIAL bench at chosen defaults + fresh CPU baseline ---"
python - <<'EOF'
import json
d = json.load(open("BENCH_CPU_BASELINE.json"))
d.pop("16384x8-k7", None)
json.dump(d, open("BENCH_CPU_BASELINE.json", "w"))
EOF
MVREG_TAPS=7 timeout 5400 python bench.py > "$R/r4_bench_official.log" 2>&1
echo "rc=$? $(date)"; tail -1 "$R/r4_bench_official.log"

echo "=== r4 queue3 done $(date) ==="

echo "--- [9] pallas-match second-stage repro (mosaic_probe4) ---"
sleep 60
timeout 2400 python scripts/mosaic_probe4.py > "$R/r4_mosaic_probe4.log" 2>&1
echo "rc=$? $(date)"; grep probe4 "$R/r4_mosaic_probe4.log"

echo "=== r4 queue3 really done $(date) ==="
