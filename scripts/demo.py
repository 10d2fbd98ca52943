#!/usr/bin/env python
"""Demo: register a pair of fragments and export aligned PLYs.

Counterpart of the reference demo script (SURVEY.md C19) with Open3D
visualization replaced by PLY export (render with any viewer).

Usage:
  python scripts/demo.py --out /tmp/demo [--ckpt runs/exp1]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

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
    ap.add_argument("--out", type=str, default="/tmp/mvreg_demo")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.cpu:
        _force_cpu()
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.core.metrics import rotation_error_deg, translation_error
    from mvreg.core.transforms import apply_transform, relative
    from mvreg.data.synthetic import make_pair
    from mvreg.data.threedmatch import write_ply
    from mvreg.pipeline import (
        extract_descriptors,
        init_params,
        register_pair,
    )
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.loop import registration_params
    from mvreg.train.state import create_train_state

    cfg = resolve_config(None, args.ckpt, ())
    if args.ckpt:
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = CheckpointManager(args.ckpt).restore(state)
        params = registration_params(state)
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)
        logging.info("untrained weights — using robust no-filter path")

    scene = make_pair(args.seed, points_per_fragment=args.points)
    pts = jnp.asarray(scene.points)
    msk = jnp.asarray(scene.mask)
    desc = extract_descriptors(params, cfg, pts, msk)
    di = jax.tree_util.tree_map(lambda a: a[0], desc)
    dj = jax.tree_util.tree_map(lambda a: a[1], desc)
    out = register_pair(params, cfg, di, dj, use_filter=args.ckpt is not None)

    R_gt, t_gt = relative(
        jnp.asarray(scene.R_gt[0]), jnp.asarray(scene.t_gt[0]),
        jnp.asarray(scene.R_gt[1]), jnp.asarray(scene.t_gt[1]),
    )
    logging.info(
        "estimated pose: rot err %.2f deg, trans err %.1f cm, conf %.2f",
        float(rotation_error_deg(out.R, R_gt)),
        100 * float(translation_error(out.t, t_gt)),
        float(out.confidence),
    )

    os.makedirs(args.out, exist_ok=True)
    p0 = np.asarray(pts[0][np.asarray(msk[0])])
    p1 = np.asarray(pts[1][np.asarray(msk[1])])
    p0_in_1 = np.asarray(apply_transform(out.R, out.t, jnp.asarray(p0)))
    write_ply(os.path.join(args.out, "frag0_raw.ply"), p0)
    write_ply(os.path.join(args.out, "frag1.ply"), p1)
    write_ply(os.path.join(args.out, "frag0_aligned.ply"), p0_in_1)
    logging.info("wrote %s/{frag0_raw,frag1,frag0_aligned}.ply", args.out)


if __name__ == "__main__":
    main()
