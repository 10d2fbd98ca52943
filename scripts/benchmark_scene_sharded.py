#!/usr/bin/env python
"""Eval-scale sharded-scene evidence run (VERDICT round-2 item 7).

Runs parallel/dist_scene.register_scene_sharded on the 8-virtual-device
CPU mesh at REAL eval scale — 30 fragments, C(30,2)=435 edges, eval
voxel capacities, num_corr=2048 — and records wall time + gauge-
invariant pose errors; optionally the single-device register_scene on
the same scene for a direct parity check at this scale (the existing
unit parity test runs at 512-voxel capacity, ~16x below eval).

Always CPU (the virtual mesh); emits one JSON artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=8"
).strip()
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"


def main() -> None:
    import jax

    jax.config.update("jax_platform_name", "cpu")
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--fragments", type=int, default=30)
    ap.add_argument("--points", type=int, default=6144)
    ap.add_argument("--ckpt", type=str, default="runs/synth_v4")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--compare-single", action="store_true")
    ap.add_argument("--json-out", type=str,
                    default="runs/results/r3_sharded_scene.json")
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    import numpy as np

    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.data.synthetic import make_scene
    from mvreg.eval.multiview import scene_pairwise_errors
    from mvreg.parallel.dist_scene import register_scene_sharded
    from mvreg.parallel.mesh import make_mesh
    from mvreg.pipeline import init_params, register_scene
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.loop import registration_params
    from mvreg.train.state import create_train_state

    cfg = resolve_config(None, args.ckpt, args.set)
    if args.ckpt:
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = CheckpointManager(args.ckpt).restore(state)
        params = registration_params(state)
        logging.info("checkpoint step %d", int(state.step))
    else:
        params = init_params(jax.random.PRNGKey(0), cfg)

    scene = make_scene(args.seed, num_fragments=args.fragments,
                       points_per_fragment=args.points)
    pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
    mesh = make_mesh()
    n_dev = len(jax.devices())
    logging.info("mesh: %s over %d devices", mesh.shape, n_dev)

    def errs(sync):
        e = scene_pairwise_errors(sync.R, sync.t, scene.R_gt, scene.t_gt)
        rot = np.asarray(e.rot_deg)
        tr = np.asarray(e.trans_m)
        return {
            "median_rot_deg": float(np.median(rot)),
            "mean_rot_deg": float(np.mean(rot)),
            "rot_at_10deg": float((rot <= 10).mean()),
            "rot_at_45deg": float((rot <= 45).mean()),
            "median_trans_m": float(np.median(tr)),
            "trans_at_25cm": float((tr <= 0.25).mean()),
            "trans_at_75cm": float((tr <= 0.75).mean()),
        }

    out = {
        "fragments": args.fragments,
        "edges": args.fragments * (args.fragments - 1) // 2,
        "points": args.points,
        "num_corr": cfg.match.num_corr,
        "capacities": list(cfg.voxel.capacities),
        "devices": n_dev,
        "backend": jax.default_backend(),
    }

    t0 = time.perf_counter()
    res_sh = register_scene_sharded(params, cfg, pts, msk, mesh)
    np.asarray(res_sh.sync.R)
    out["sharded_wall_s"] = round(time.perf_counter() - t0, 1)
    out["sharded"] = errs(res_sh.sync)
    logging.info("sharded: %.1fs %s", out["sharded_wall_s"],
                 json.dumps(out["sharded"]))
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)

    if args.compare_single:
        t0 = time.perf_counter()
        res_1 = jax.jit(
            lambda p, x, m: register_scene(p, cfg, x, m)
        )(params, pts, msk)
        np.asarray(res_1.sync.R)
        out["single_wall_s"] = round(time.perf_counter() - t0, 1)
        out["single"] = errs(res_1.sync)
        # gauge-invariant agreement between the two solutions
        e = scene_pairwise_errors(
            res_sh.sync.R, res_sh.sync.t,
            np.asarray(res_1.sync.R), np.asarray(res_1.sync.t),
        )
        out["sharded_vs_single_max_rot_deg"] = float(
            np.max(np.asarray(e.rot_deg)))
        out["sharded_vs_single_max_trans_m"] = float(
            np.max(np.asarray(e.trans_m)))
        logging.info("single: %.1fs %s", out["single_wall_s"],
                     json.dumps(out["single"]))
        logging.info("parity: max rot %.4f deg, max trans %.4f m",
                     out["sharded_vs_single_max_rot_deg"],
                     out["sharded_vs_single_max_trans_m"])

    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
