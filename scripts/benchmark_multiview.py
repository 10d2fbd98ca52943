#!/usr/bin/env python
"""Multiview registration benchmark (ScanNet/L2Sync protocol).

Counterpart of `ref:scripts/benchmark_multiview_registration.py`
(SURVEY.md C18, §3.3): per scene, all-pairs pairwise registration →
confidence-pruned IRLS synchronization → pooled ECDF of relative pose
errors. Runs on synthetic scenes by default (no datasets in this
environment); pass --scene-dirs with 3DMatch-layout directories for real
data.

Usage:
  python scripts/benchmark_multiview.py --scenes 4 --fragments 8 \
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
    ap.add_argument("--scene-dirs", nargs="*", default=None,
                    help="ScanNet-layout scene dirs (fragment PLYs + poses)")
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--fragments", type=int, default=8)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--no-filter", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()
    if args.cpu:
        _force_cpu()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.data.synthetic import make_scene
    from mvreg.eval.multiview import (
        format_report,
        pooled_report,
        scene_pairwise_errors,
    )
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
        mgr = CheckpointManager(args.ckpt)
        state = mgr.restore(state)
        params = registration_params(state)
        logging.info("loaded checkpoint step %d", int(state.step))
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
        logging.info("using untrained weights (sanity/perf run)")

    # Staged execution: three small reusable programs instead of one
    # monolithic N-fragment scene program (whose compile blew the
    # round-1 30-fragment eval timeout). Edge chunks re-use ONE compiled
    # program of static shape (EDGE_CHUNK, 2) across all chunks/scenes.
    t_start = time.perf_counter()

    def mark(msg):
        logging.info("[mv +%6.1fs] %s", time.perf_counter() - t_start, msg)

    extract = jax.jit(lambda p, x, m: extract_descriptors(p, cfg, x, m))
    EDGE_CHUNK = int(cfg.match.edge_batch)
    edges_fn = jax.jit(
        lambda p, d, e: register_edges(
            p, cfg, d, e, use_filter=not args.no_filter
        )
    )

    def sync_fn_for(n):
        return jax.jit(
            lambda e_idx, pairs, d: sync_with_refine(
                cfg, e_idx, pairs, n_nodes=n, desc=d
            )
        )

    sync_fns = {}

    def run_scene(scene, s):
        N = scene.points.shape[0]
        pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
        desc = extract(params, pts, msk)
        np.asarray(desc.feats[0, 0])  # readback barrier (axon relay)
        mark(f"scene {s}: descriptors for {N} fragments done")
        edge_idx = np.asarray(all_pairs(N))
        E = edge_idx.shape[0]
        chunks = []
        for k0 in range(0, E, EDGE_CHUNK):
            chunk = edge_idx[k0 : k0 + EDGE_CHUNK]
            pad = EDGE_CHUNK - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 2), np.int32)])
            out = edges_fn(params, desc, jnp.asarray(chunk))
            chunks.append(
                jax.tree_util.tree_map(
                    lambda a: a[: EDGE_CHUNK - pad], out
                )
            )
        pairs = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks
        )
        np.asarray(pairs.confidence)
        mark(f"scene {s}: {E} pairwise registrations done")
        if N not in sync_fns:
            sync_fns[N] = sync_fn_for(N)
        pairs, sync = sync_fns[N](jnp.asarray(edge_idx), pairs, desc)
        np.asarray(sync.R)
        mark(f"scene {s}: sync + {cfg.sync.refine_iters} refine done")
        return sync

    if args.scene_dirs:
        from mvreg.data.scannet import load_scene

        scenes = [
            load_scene(d, points_per_fragment=args.points)
            for d in args.scene_dirs
        ]
    else:
        scenes = [
            make_scene(args.seed + s, num_fragments=args.fragments,
                       points_per_fragment=args.points)
            for s in range(args.scenes)
        ]

    def dump(report, partial):
        if not args.json_out:
            return
        payload = {
            "rot_ecdf": report.rot_ecdf,
            "trans_ecdf": report.trans_ecdf,
            "mean_rot_deg": report.mean_rot_deg,
            "median_rot_deg": report.median_rot_deg,
            "mean_trans_m": report.mean_trans_m,
            "num_pairs": report.num_pairs,
            "scenes_done": partial,
            "scenes_total": len(scenes),
        }
        tmp = args.json_out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f, indent=2)
        os.replace(tmp, args.json_out)

    errors = []
    t_scene = []
    for s, scene in enumerate(scenes):
        t0 = time.perf_counter()
        sync = run_scene(scene, s)
        dt = time.perf_counter() - t0
        t_scene.append(dt)
        err = scene_pairwise_errors(
            sync.R, sync.t, scene.R_gt, scene.t_gt
        )
        errors.append(err)
        logging.info(
            "scene %d: %.2fs, median rot %.2f deg, median trans %.1f cm",
            s, dt, float(jnp.median(jnp.asarray(err.rot_deg))),
            100 * float(jnp.median(jnp.asarray(err.trans_m))),
        )
        # partial results survive an external timeout kill
        dump(pooled_report(errors), partial=s + 1)

    report = pooled_report(errors)
    logging.info("%s", format_report(report))
    logging.info(
        "steady-state scene time: %.2fs (first includes compile: %.2fs)",
        min(t_scene[1:]) if len(t_scene) > 1 else t_scene[0], t_scene[0],
    )
    dump(report, partial=len(scenes))


if __name__ == "__main__":
    main()
