#!/usr/bin/env python
"""Pairwise registration benchmark (3DMatch registration recall).

Counterpart of `ref:scripts/benchmark_pairwise_registration.py`
(SURVEY.md C17, §3.2). Two modes:

  --scene-dirs DIR [DIR...]   real 3DMatch-layout scene directories
                              (cloud_bin_*.ply + gt.log [+ gt.info])
  (default)                   synthetic scenes: fragments + GT pairs are
                              generated, recall computed with identity
                              info matrices

Usage:
  python scripts/benchmark_pairwise.py --scenes 2 --fragments 6 \
      [--ckpt runs/exp1] [--no-filter]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu() -> None:
    """Hard-select the CPU backend (the axon TPU relay is single-
    client; a stray CPU-intended process would block real TPU jobs;
    env vars don't survive the container's sitecustomize)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend")
    ap.add_argument("--scene-dirs", nargs="*", default=None)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--fragments", type=int, default=6)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--no-filter", action="store_true")
    ap.add_argument("--seed", type=int, default=100)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--set", action="append", default=[])
    # Protocol fidelity (gt.log semantics, SURVEY.md C17): 3DMatch's
    # gt.log lists ONLY pairs with >30% overlap; pairs below never enter
    # the recall denominator. Round 2 scored every i<j (including
    # zero-overlap pairs as automatic failures) — both numbers are
    # reported once for continuity, but `recall` now means the
    # overlap-filtered protocol one.
    ap.add_argument("--min-overlap", type=float, default=0.3)
    args = ap.parse_args()
    if args.cpu:
        _force_cpu()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.core.transforms import to_matrix
    from mvreg.data.synthetic import make_scene
    from mvreg.data.threedmatch import GtPair, load_scene_dir
    from mvreg.eval.pairwise import aggregate_recall, evaluate_scene_pairs
    from mvreg.pipeline import (
        extract_descriptors,
        init_params,
        register_edges,
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
        logging.info("using untrained weights (sanity/perf run)")

    extract = jax.jit(lambda p, x, m: extract_descriptors(p, cfg, x, m))
    edges_fn = jax.jit(
        lambda p, d, e: register_edges(
            p, cfg, d, e, use_filter=not args.no_filter
        )
    )

    def run_scene(fragments_np, masks_np, gt_pairs, gt_infos, name,
                  overlap_frac=None):
        """One scene: batched descriptor extract + one chunk-batched
        register_edges dispatch over all gt pairs (config 1's "batched
        Procrustes over all pairs" — round 2 dispatched pairs one at a
        time from Python, 435 relay round-trips at scene scale)."""
        t0 = time.perf_counter()
        desc = extract(params, jnp.asarray(fragments_np),
                       jnp.asarray(masks_np))
        edge_idx = jnp.asarray(
            np.array([[p.i, p.j] for p in gt_pairs], np.int32)
        )
        pairs = edges_fn(params, desc, edge_idx)
        Rs = np.asarray(pairs.R)
        ts = np.asarray(pairs.t)
        est = [
            np.asarray(to_matrix(jnp.asarray(Rs[k]), jnp.asarray(ts[k])))
            for k in range(len(gt_pairs))
        ]
        dt = time.perf_counter() - t0
        res = evaluate_scene_pairs(est, gt_pairs, gt_infos)
        # Protocol recall: only >min_overlap pairs enter the denominator
        # (gt.log semantics). Real scene dirs arrive pre-filtered by
        # gt.log itself — there res_protocol == res.
        if overlap_frac is not None:
            keep = [
                k for k, p in enumerate(gt_pairs)
                if overlap_frac[(p.i, p.j)] >= args.min_overlap
            ]
            res_prot = evaluate_scene_pairs(
                [est[k] for k in keep], [gt_pairs[k] for k in keep],
                gt_infos,
            )
        else:
            res_prot = res
        n_frag = len(fragments_np)
        logging.info(
            "%s: %d fragments, %d gt pairs, recall %.3f "
            "(all-pairs %.3f), %.2fs (%.2f fragments/s)",
            name, n_frag, len(gt_pairs), res_prot.recall, res.recall,
            dt, n_frag / dt,
        )
        return res_prot, res

    results, results_all = {}, {}
    if args.scene_dirs:
        P = args.points
        for d in args.scene_dirs:
            s = load_scene_dir(d)
            n = len(s.fragments)
            frags = np.zeros((n, P, 3), np.float32)
            masks = np.zeros((n, P), bool)
            rng = np.random.default_rng(0)
            for k, f in enumerate(s.fragments):
                take = (
                    rng.choice(len(f), P, replace=False)
                    if len(f) > P else np.arange(len(f))
                )
                frags[k, : len(take)] = f[take]
                masks[k, : len(take)] = True
            results[s.name], results_all[s.name] = run_scene(
                frags, masks, s.gt_pairs, s.gt_infos, s.name
            )
    else:
        for si in range(args.scenes):
            scene = make_scene(
                args.seed + si, num_fragments=args.fragments,
                points_per_fragment=args.points,
            )
            # GT pairs + per-pair overlap fraction, with protocol-
            # faithful gt.info matrices computed from the GT-overlap
            # point set (Redwood generation convention: Info = Σ AᵀA
            # over overlap points in the source frame).
            from scipy.spatial import cKDTree

            from mvreg.core.transforms import apply_transform, relative
            from mvreg.data.threedmatch import GtInfo
            from mvreg.eval.pairwise import info_matrix_from_points

            gt_pairs, gt_infos, ov_frac = [], [], {}
            for i in range(args.fragments):
                for j in range(i + 1, args.fragments):
                    R, t = relative(
                        jnp.asarray(scene.R_gt[i]), jnp.asarray(scene.t_gt[i]),
                        jnp.asarray(scene.R_gt[j]), jnp.asarray(scene.t_gt[j]),
                    )
                    gt_pairs.append(
                        GtPair(i=i, j=j,
                               transform=np.asarray(to_matrix(R, t)))
                    )
                    # overlap = domain-frame (i) points landing within
                    # 5 cm of a target (j) point under the GT transform
                    # (relative() maps frame-i coordinates into frame j,
                    # so ξ = log(T_gt⁻¹T_est) acts on fragment-i points).
                    # The pair overlap fraction is symmetrized with max
                    # (the convention of 3DMatch-style overlap lists).
                    src = scene.points[i][scene.mask[i]]
                    dst = scene.points[j][scene.mask[j]]
                    moved = np.asarray(
                        apply_transform(R, t, jnp.asarray(src))
                    )
                    tree_dst = cKDTree(dst)
                    d, _ = tree_dst.query(moved, k=1)
                    ov = src[d < 0.05]
                    d_back, _ = cKDTree(moved).query(dst, k=1)
                    ov_frac[(i, j)] = max(
                        len(ov) / max(len(src), 1),
                        float((d_back < 0.05).mean()),
                    )
                    if len(ov) >= 10:
                        gt_infos.append(
                            GtInfo(i=i, j=j,
                                   info=info_matrix_from_points(ov))
                        )
            name = f"synthetic_{si}"
            results[name], results_all[name] = run_scene(
                scene.points, scene.mask, gt_pairs, gt_infos or None,
                name, overlap_frac=ov_frac,
            )

    table = aggregate_recall(results)
    table_all = aggregate_recall(results_all)
    out = {
        "recall": table,  # protocol (gt.log semantics: overlap-filtered)
        "recall_allpairs": table_all,  # legacy round-1/2 number
        "min_overlap": args.min_overlap,
    }
    logging.info("recall per scene: %s", json.dumps(out, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
