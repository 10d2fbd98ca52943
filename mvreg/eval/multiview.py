"""ScanNet multiview benchmark: post-sync ECDF of relative pose errors.

Counterpart of `ref:scripts/benchmark_multiview_registration.py`
(SURVEY.md C18, call stack §3.3; L2Sync protocol): per scene of N
fragments, compare the relative poses implied by the synchronized
absolute poses against GT for all C(N,2) pairs, and pool the angular /
translation errors over scenes into ECDFs at the standard thresholds
{3, 5, 10, 30, 45}° and {5, 10, 25, 50, 75} cm. Also reports the mean
rotation error — the driver's headline multiview metric [B:metric].
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from mvreg.core import transforms as tf
from mvreg.core.metrics import rotation_error_deg, translation_error

ROT_THRESHOLDS_DEG = (3.0, 5.0, 10.0, 30.0, 45.0)
TRANS_THRESHOLDS_M = (0.05, 0.10, 0.25, 0.50, 0.75)


class MultiviewSceneErrors(NamedTuple):
    rot_deg: np.ndarray  # (E,) per-pair angular errors
    trans_m: np.ndarray  # (E,)


def scene_pairwise_errors(
    R_est: np.ndarray,
    t_est: np.ndarray,
    R_gt: np.ndarray,
    t_gt: np.ndarray,
    valid: np.ndarray | None = None,
) -> MultiviewSceneErrors:
    """Gauge-invariant all-pairs relative-pose errors for one scene."""
    n = R_est.shape[0]
    pairs = np.array(
        [(i, j) for i in range(n) for j in range(i + 1, n)], np.int32
    )
    i, j = pairs[:, 0], pairs[:, 1]
    Re, te = tf.relative(
        jnp.asarray(R_est)[i], jnp.asarray(t_est)[i],
        jnp.asarray(R_est)[j], jnp.asarray(t_est)[j],
    )
    Rg, tg = tf.relative(
        jnp.asarray(R_gt)[i], jnp.asarray(t_gt)[i],
        jnp.asarray(R_gt)[j], jnp.asarray(t_gt)[j],
    )
    rot = np.asarray(rotation_error_deg(Re, Rg))
    tr = np.asarray(translation_error(te, tg))
    if valid is not None:
        keep = valid[i] & valid[j]
        rot, tr = rot[keep], tr[keep]
    return MultiviewSceneErrors(rot_deg=rot, trans_m=tr)


class MultiviewReport(NamedTuple):
    rot_ecdf: dict[float, float]
    trans_ecdf: dict[float, float]
    mean_rot_deg: float
    median_rot_deg: float
    mean_trans_m: float
    median_trans_m: float
    num_pairs: int


def pooled_report(
    scene_errors: list[MultiviewSceneErrors],
) -> MultiviewReport:
    """Pool per-scene errors into the protocol's ECDF table."""
    rot = (
        np.concatenate([s.rot_deg for s in scene_errors])
        if scene_errors else np.zeros(0)
    )
    tr = (
        np.concatenate([s.trans_m for s in scene_errors])
        if scene_errors else np.zeros(0)
    )
    n = max(len(rot), 1)
    return MultiviewReport(
        rot_ecdf={t: float((rot <= t).sum() / n) for t in ROT_THRESHOLDS_DEG},
        trans_ecdf={
            t: float((tr <= t).sum() / n) for t in TRANS_THRESHOLDS_M
        },
        mean_rot_deg=float(rot.mean()) if len(rot) else float("nan"),
        median_rot_deg=float(np.median(rot)) if len(rot) else float("nan"),
        mean_trans_m=float(tr.mean()) if len(tr) else float("nan"),
        median_trans_m=float(np.median(tr)) if len(tr) else float("nan"),
        num_pairs=len(rot),
    )


def format_report(report: MultiviewReport) -> str:
    lines = ["Multiview synchronization report (L2Sync protocol)"]
    lines.append(
        "  rotation ECDF:    "
        + "  ".join(
            f"<={t:g}deg: {v * 100:5.1f}%" for t, v in report.rot_ecdf.items()
        )
    )
    lines.append(
        "  translation ECDF: "
        + "  ".join(
            f"<={t * 100:g}cm: {v * 100:5.1f}%"
            for t, v in report.trans_ecdf.items()
        )
    )
    lines.append(
        f"  mean rot err: {report.mean_rot_deg:.2f} deg"
        f" | median: {report.median_rot_deg:.2f} deg"
        f" | mean trans err: {report.mean_trans_m * 100:.1f} cm"
        f" | pairs: {report.num_pairs}"
    )
    return "\n".join(lines)
