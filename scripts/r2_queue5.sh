#!/bin/sh
# Round-2 chip queue 5 (final): per-edge diagnosis of the 8-fragment
# scene whose tail persists ON CHIP (seed 1), and a num_corr=2048 probe
# of the same benchmark. Must be finished well before round end — the
# caller caps the whole script; steps are sized to finish, not be killed.
set -x
cd /root/repo
R=runs/results

timeout 2400 python scripts/diagnose_scene.py --ckpt runs/synth_v4 \
  --fragments 8 --points 6144 --seed 1 \
  --json-out $R/r2_scene8s1_diag_chip.json > $R/r2_scene8s1_diag_chip.log 2>&1

timeout 2400 python scripts/benchmark_multiview.py --scenes 2 --fragments 8 \
  --points 6144 --ckpt runs/synth_v4 --set "match.num_corr=2048" \
  --json-out $R/r2_mv8_v4_chip_2048.json > $R/r2_mv8_v4_chip_2048.log 2>&1

echo QUEUE5_DONE
