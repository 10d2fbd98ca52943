#!/usr/bin/env python
"""Per-edge diagnostics on a full multiview scene.

Runs the staged scene pipeline on one synthetic N-fragment scene and
dumps, per edge: GT overlap (crop-center distance), confidence, pairwise
rotation/translation error vs the GT relative pose, match support, and
the post-sync IRLS weight/residual — the data needed to see WHY a
30-fragment sync fails when 8-fragment scenes succeed (VERDICT.md
round-1 item 2).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--fragments", type=int, default=30)
    ap.add_argument("--points", type=int, default=6144)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.core.metrics import rotation_error_deg, translation_error
    from mvreg.core.transforms import relative
    from mvreg.data.synthetic import make_scene
    from mvreg.eval.multiview import scene_pairwise_errors
    from mvreg.pipeline import (
        all_pairs,
        extract_descriptors,
        init_params,
        register_edges,
        sync_with_refine,
    )
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.loop import registration_params
    from mvreg.train.state import create_train_state

    cfg = resolve_config(args.config, args.ckpt, args.set)
    if args.ckpt:
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = CheckpointManager(args.ckpt).restore(state)
        params = registration_params(state)
        logging.info("loaded checkpoint step %d", int(state.step))
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)

    N = args.fragments
    scene = make_scene(args.seed, num_fragments=N,
                       points_per_fragment=args.points)
    pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)

    t0 = time.perf_counter()
    extract = jax.jit(lambda p, x, m: extract_descriptors(p, cfg, x, m))
    desc = extract(params, pts, msk)
    np.asarray(desc.feats[0, 0])
    logging.info("descriptors %.1fs", time.perf_counter() - t0)

    edge_idx = np.asarray(all_pairs(N))
    E = edge_idx.shape[0]
    CH = int(cfg.match.edge_batch)
    edges_fn = jax.jit(lambda p, d, e: register_edges(p, cfg, d, e))
    chunks = []
    for k0 in range(0, E, CH):
        chunk = edge_idx[k0 : k0 + CH]
        pad = CH - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.int32)])
        out = edges_fn(params, desc, jnp.asarray(chunk))
        chunks.append(jax.tree_util.tree_map(lambda a: a[: CH - pad], out))
    pairs = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *chunks
    )
    np.asarray(pairs.confidence)
    logging.info("edges %.1fs", time.perf_counter() - t0)

    sync_fn = jax.jit(
        lambda e, p: sync_with_refine(cfg, e, p, n_nodes=N)
    )
    pairs2, sync = sync_fn(jnp.asarray(edge_idx), pairs)
    np.asarray(sync.R)
    logging.info("sync %.1fs", time.perf_counter() - t0)

    # GT relative poses per edge
    Rg = jnp.asarray(scene.R_gt)
    tg = jnp.asarray(scene.t_gt)
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    R_gt_ij, t_gt_ij = relative(Rg[i], tg[i], Rg[j], tg[j])
    rot_err = np.asarray(rotation_error_deg(pairs.R, R_gt_ij))
    tr_err = np.asarray(translation_error(pairs.t, t_gt_ij))
    # GT-inlier rate of the putative matches per edge: the ceiling any
    # downstream robust solver can work with.
    xs, ys = np.asarray(pairs.x), np.asarray(pairs.y)
    cms = np.asarray(pairs.corr_mask).astype(bool)
    moved = np.einsum("eij,ekj->eki", np.asarray(R_gt_ij), xs) + np.asarray(
        t_gt_ij
    )[:, None, :]
    derr = np.linalg.norm(moved - ys, axis=-1)
    gt_inl = np.where(
        cms.sum(-1) > 0,
        (derr < 0.1).astype(np.float32).sum(-1)
        / np.maximum(cms.sum(-1), 1),
        0.0,
    )
    center_d = np.linalg.norm(
        scene.centers[i] - scene.centers[j], axis=-1
    )
    conf = np.asarray(pairs.confidence)
    ovl = np.asarray(pairs.overlap)
    w_sum = np.asarray(jnp.sum(pairs.weights * pairs.corr_mask, axis=-1))
    n_corr = np.asarray(jnp.sum(pairs.corr_mask, axis=-1))
    w_sync = np.asarray(sync.weights)
    r_sync = np.asarray(sync.residuals)

    # overlap = crop centers closer than ~1.5 (radius 1.2 each): genuine
    overlap = center_d < 1.8
    good_pair = rot_err < 15.0
    thr = cfg.sync.confidence_threshold

    def frac(x):
        return float(np.mean(x)) if len(x) else 0.0

    summary = {
        "edges": int(E),
        "overlap_edges": int(overlap.sum()),
        "pairwise": {
            "rot_err_median_overlap": float(np.median(rot_err[overlap])),
            "rot_err_median_junk": float(np.median(rot_err[~overlap])),
            "good_overlap_frac": frac(good_pair[overlap]),
            "good_junk_frac": frac(good_pair[~overlap]),
            "gt_inlier_median_overlap": float(np.median(gt_inl[overlap])),
            "gt_inlier_median_on_good": float(
                np.median(gt_inl[good_pair])
            ) if good_pair.any() else 0.0,
            "gt_inlier_median_on_bad": float(
                np.median(gt_inl[~good_pair])
            ) if (~good_pair).any() else 0.0,
        },
        "confidence": {
            "mean_overlap": frac(conf[overlap]),
            "mean_junk": frac(conf[~overlap]),
            "junk_above_thr": frac(conf[~overlap] >= thr),
            "overlap_above_thr": frac(conf[overlap] >= thr),
            "bad_edge_above_thr": frac(conf[~good_pair] >= thr),
            "auroc_good_vs_bad": _auroc(conf, good_pair),
        },
        "overlap_score": {
            "mean_on_good": frac(ovl[good_pair]),
            "mean_on_bad": frac(ovl[~good_pair]),
            "auroc_good_vs_bad": _auroc(ovl, good_pair),
        },
        "sync_weights": {
            "mean_on_good": frac(w_sync[good_pair]),
            "mean_on_bad": frac(w_sync[~good_pair]),
        },
    }
    err = scene_pairwise_errors(
        np.asarray(sync.R), np.asarray(sync.t), scene.R_gt, scene.t_gt
    )
    summary["post_sync"] = {
        "median_rot_deg": float(np.median(err.rot_deg)),
        "mean_rot_deg": float(np.mean(err.rot_deg)),
        "median_trans_m": float(np.median(err.trans_m)),
    }
    print(json.dumps(summary, indent=1))

    rows = [
        {
            "i": int(i[k]), "j": int(j[k]),
            "center_d": round(float(center_d[k]), 3),
            "conf": round(float(conf[k]), 4),
            "ovl": round(float(ovl[k]), 4),
            "gt_inl": round(float(gt_inl[k]), 4),
            "rot_err": round(float(rot_err[k]), 2),
            "tr_err": round(float(tr_err[k]), 3),
            "n_corr": int(n_corr[k]),
            "w_sum": round(float(w_sum[k]), 2),
            "w_sync": round(float(w_sync[k]), 4),
            "r_sync": round(float(r_sync[k]), 3),
        }
        for k in range(E)
    ]
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump({"summary": summary, "edges": rows}, fh)
        logging.info("wrote %s", args.json_out)


def _auroc(score, label) -> float:
    import numpy as np

    pos = score[label]
    neg = score[~label]
    if len(pos) == 0 or len(neg) == 0:
        return float("nan")
    order = np.argsort(np.concatenate([pos, neg]))
    ranks = np.empty(len(order), float)
    ranks[order] = np.arange(1, len(order) + 1)
    r_pos = ranks[: len(pos)].sum()
    return float(
        (r_pos - len(pos) * (len(pos) + 1) / 2) / (len(pos) * len(neg))
    )


if __name__ == "__main__":
    main()
