#!/usr/bin/env python
"""Match-quality probe: descriptor/matching/filtering error breakdown.

Registers synthetic pairs with a checkpoint (or fresh params) and reports
the stage-by-stage quality signals that the end metrics hide:
GT-inlier rate of the putative matches (the descriptor's real score),
mutual-match count, pre/post-filter pose errors, and edge confidence.
Reference has no such tool; its equivalent is eyeballing the benchmark
(SURVEY.md §4) — this makes descriptor regressions diagnosable in one run.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--points", type=int, default=6144)
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 100, 101])
    ap.add_argument(
        "--negative-seeds", type=int, nargs="*", default=[],
        help="probe zero-overlap pairs (same world, disjoint crops) — "
        "the junk-edge distribution of C(N,2) scene graphs; their "
        "confidence must be LOW",
    )
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.WARNING)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.core.metrics import rotation_error_deg, translation_error
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params, register_pair
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.loop import registration_params
    from mvreg.train.state import create_train_state

    cfg = resolve_config(args.config, args.ckpt, args.set)

    if args.ckpt:
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        mgr = CheckpointManager(args.ckpt)
        state = mgr.restore(state)
        print(f"loaded checkpoint step {int(state.step)}")
        params = registration_params(state)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def probe(params, pts, msk):
        desc = extract_descriptors(params, cfg, pts, msk)
        di = jax.tree_util.tree_map(lambda a: a[0], desc)
        dj = jax.tree_util.tree_map(lambda a: a[1], desc)
        of = register_pair(params, cfg, di, dj, use_filter=True)
        on = register_pair(params, cfg, di, dj, use_filter=False)
        return of, on

    def fit_stats(of):
        """Host-side edge stats: self-consistency of the estimated fit."""
        x, y = np.asarray(of.x), np.asarray(of.y)
        cm = np.asarray(of.corr_mask).astype(bool)
        w = np.asarray(of.weights)
        res = np.linalg.norm(
            x @ np.asarray(of.R).T + np.asarray(of.t) - y, axis=-1
        )
        return {
            "mutual_corr": int(cm.sum()),
            "confidence": float(of.confidence),
            "mean_weight": float(w[cm].mean()) if cm.any() else 0.0,
            "frac_close": float((res[cm] < 0.1).mean()) if cm.any() else 0.0,
        }

    rows = []
    for seed in args.seeds:
        scene = make_pair(seed=seed, points_per_fragment=args.points)
        pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
        R0, t0 = scene.R_gt[0], scene.t_gt[0]
        R1, t1 = scene.R_gt[1], scene.t_gt[1]
        Rg, tg = R1.T @ R0, R1.T @ (t0 - t1)
        of, on = probe(params, pts, msk)
        x = np.asarray(of.x)
        y = np.asarray(of.y)
        cm = np.asarray(of.corr_mask).astype(bool)
        d = np.linalg.norm(x @ Rg.T + tg - y, axis=-1)
        row = {
            "seed": seed,
            "gt_inlier_rate": float((d[cm] < 0.1).mean()) if cm.any() else 0.0,
            "rot_err_filter": float(rotation_error_deg(of.R, jnp.asarray(Rg))),
            "trans_err_filter": float(
                translation_error(of.t, jnp.asarray(tg))
            ),
            "rot_err_nofilter": float(
                rotation_error_deg(on.R, jnp.asarray(Rg))
            ),
            **fit_stats(of),
        }
        rows.append(row)
        print(json.dumps(row))

    neg_rows = []
    for seed in args.negative_seeds:
        from mvreg.data.synthetic import make_scene

        # disjoint crops (separation 3.4 m > 2x crop radius 1.2 m) on one
        # shared world: zero overlap but the same floor/wall texture —
        # the hard-negative distribution of a 30-node scene graph
        scene = make_scene(
            seed, num_fragments=2, points_per_fragment=args.points,
            centers_override=np.array([[1.0, 1.0, 0.2], [3.4, 3.4, 0.2]]),
        )
        pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
        of, _ = probe(params, pts, msk)
        row = {"seed": seed, "negative": True, **fit_stats(of)}
        neg_rows.append(row)
        print(json.dumps(row))

    summary = {
        "mean_gt_inlier_rate": float(
            np.mean([r["gt_inlier_rate"] for r in rows])
        ),
        "mean_rot_err_filter": float(
            np.mean([r["rot_err_filter"] for r in rows])
        ),
        "rows": rows,
    }
    if neg_rows:
        summary["mean_positive_confidence"] = float(
            np.mean([r["confidence"] for r in rows])
        )
        summary["mean_negative_confidence"] = float(
            np.mean([r["confidence"] for r in neg_rows])
        )
        summary["negative_rows"] = neg_rows
    print("mean gt_inlier_rate:", summary["mean_gt_inlier_rate"])
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
