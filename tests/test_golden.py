"""Golden-number regression tests (SURVEY.md §4.4).

The learned path changes as training recipes evolve; the *geometry* path
(matching with oracle descriptors → IRLS Procrustes → IRLS sync) is
deterministic given seeds, so its metrics are pinned here against golden
values. A numerics regression anywhere in voxelize/match/Procrustes/sync
moves these numbers.

Regenerate (after an intentional change): pytest tests/test_golden.py
with MVREG_REGEN_GOLDEN=1, then review the diff.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from mvreg.core import transforms as tf
from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.core.procrustes import irls_kabsch
from mvreg.data.synthetic import make_scene
from mvreg.ops.knn import mutual_match
from mvreg.models.fcgf import build_unet_plan
from mvreg.sync.irls import synchronize

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "geometry.json")


def _run_geometry_config():
    """Deterministic oracle-descriptor multiview run (driver config 2 shape)."""
    scene = make_scene(seed=777, num_fragments=6, points_per_fragment=3072,
                       noise=0.003)
    pts = jnp.asarray(scene.points)
    mask = jnp.asarray(scene.mask)
    caps = (2048, 1024, 512, 256)
    plan = build_unet_plan(pts, mask, 0.05, caps)
    g = plan.grids[0]
    centers = g.origin[:, None, :] + (
        g.coords.astype(jnp.float32) + 0.5
    ) * g.voxel_size[:, None, None]
    R_gt = jnp.asarray(scene.R_gt)
    t_gt = jnp.asarray(scene.t_gt)
    world = jnp.einsum("bij,bvj->bvi", R_gt, centers) + t_gt[:, None, :]
    freqs = jnp.array([2.0, 5.0, 11.0])
    enc = jnp.concatenate(
        [jnp.sin(world[..., None] * freqs), jnp.cos(world[..., None] * freqs)],
        axis=-1,
    ).reshape(world.shape[0], world.shape[1], -1)
    desc = enc * jax.lax.rsqrt(jnp.sum(enc**2, -1, keepdims=True) + 1e-12)
    vmask = plan.masks[0]

    N = 6
    pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
    edge_idx = jnp.array(pairs, jnp.int32)
    Rs, ts, counts = [], [], []
    for i, j in pairs:
        idx, _, mut = mutual_match(desc[i], vmask[i], desc[j], vmask[j])
        cm = vmask[i] & mut
        x = centers[i] * cm[:, None]
        y = centers[j][idx] * cm[:, None]
        R, t, _ = irls_kabsch(x, y, cm.astype(jnp.float32), 3, 0.05)
        Rs.append(R)
        ts.append(t)
        counts.append(jnp.sum(cm))
    R_ij = jnp.stack(Rs)
    t_ij = jnp.stack(ts)
    c = jnp.stack(counts).astype(jnp.float32) / vmask.shape[-1]
    out = synchronize(edge_idx, R_ij, t_ij, c, n_nodes=N, num_iters=8,
                      cauchy_b=0.15)

    i, j = edge_idx[:, 0], edge_idx[:, 1]
    Re, te = tf.relative(out.R[i], out.t[i], out.R[j], out.t[j])
    Rg, tg = tf.relative(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
    rot = np.asarray(rotation_error_deg(Re, Rg))
    tr = np.asarray(translation_error(te, tg))
    return {
        "median_rot_deg": float(np.median(rot)),
        "median_trans_m": float(np.median(tr)),
        "mean_mutual_count": float(np.mean(np.asarray(jnp.stack(counts)))),
        "mean_edge_weight": float(np.mean(np.asarray(out.weights))),
    }


def test_geometry_golden():
    got = _run_geometry_config()
    if os.environ.get("MVREG_REGEN_GOLDEN"):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=2)
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    # CPU/TPU and compiler-version drift tolerance: 10% relative + small abs.
    for k, v in want.items():
        assert abs(got[k] - v) <= 0.1 * abs(v) + 1e-3, (k, got[k], v)
