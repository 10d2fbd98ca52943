#!/bin/sh
# Dataset acquisition (SURVEY.md C20).
#
# Counterpart of the reference's download scripts: fetches the
# preprocessed 3DMatch training set, the 3DMatch test scenes (8 scenes,
# gt.log/gt.info layout), and the ScanNet multiview evaluation scenes.
# The canonical sources are the ones the reference publishes:
#   3DMatch train (FCGF preprocessing): http://node2.chrischoy.org/data/datasets/registration/threedmatch.tgz
#   3DMatch test scenes:                http://vision.princeton.edu/projects/2016/3DMatch/downloads/scene-fragments/
#   Multiview (ScanNet) eval set:       per the reference repo's release page
#
# In a zero-egress environment this script generates SYNTHETIC stand-ins
# in the exact on-disk layouts instead, so every downstream harness
# (benchmark_pairwise --scene-dirs, benchmark_multiview, readers) runs
# unchanged.

set -e
ROOT="${1:-data}"
MODE="${2:-synthetic}"

if [ "$MODE" = "real" ]; then
    echo "Fetching real datasets requires network egress; see URLs in this script."
    exit 1
fi

echo "Generating synthetic datasets under $ROOT (layouts match the real sets)"
python - "$ROOT" <<'EOF'
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) or ".")
sys.path.insert(0, ".")
import numpy as np

from mvreg.core.transforms import relative, to_matrix
from mvreg.data.scannet import write_synthetic_scene_dir
from mvreg.data.synthetic import make_scene
from mvreg.data.threedmatch import GtPair, write_gt_log, write_ply

import jax.numpy as jnp

root = sys.argv[1]

# 3DMatch-layout test scenes: fragments + gt.log
for si in range(2):
    scene = make_scene(1000 + si, num_fragments=6, points_per_fragment=8192)
    d = os.path.join(root, "threedmatch_test", f"synth-scene{si}")
    os.makedirs(d, exist_ok=True)
    pairs = []
    for k in range(6):
        write_ply(os.path.join(d, f"cloud_bin_{k}.ply"),
                  scene.points[k][scene.mask[k]])
    for i in range(6):
        for j in range(i + 1, 6):
            R, t = relative(
                jnp.asarray(scene.R_gt[i]), jnp.asarray(scene.t_gt[i]),
                jnp.asarray(scene.R_gt[j]), jnp.asarray(scene.t_gt[j]),
            )
            pairs.append(GtPair(i=i, j=j, transform=np.asarray(to_matrix(R, t))))
    write_gt_log(os.path.join(d, "gt.log"), pairs, 6)
    print("wrote", d)

# ScanNet-layout multiview scenes: fragments + pose_*.txt
for si in range(2):
    d = os.path.join(root, "scannet_eval", f"synth-scan{si}")
    write_synthetic_scene_dir(d, seed=2000 + si, num_fragments=8,
                              points_per_fragment=8192)
    print("wrote", d)
EOF
echo "done"
