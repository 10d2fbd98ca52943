#!/usr/bin/env python
"""Chained-marginal A/B of conv schedules on REAL brick plans per level.

Round-4 question (VERDICT item 1): does the Pallas window-assembly
kernel make the brick schedule beat taps at the UNet's per-level shapes?
Unlike conv_microbench.py (synthetic near-diagonal kernel maps), this
builds the actual voxel grids + brick plans from bench-scale synthetic
fragments, so brick occupancy and kernel-map hit rates are the real
ones.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--levels", default="0,1,2,3")
    ap.add_argument(
        "--impls", default="taps,brick,brick_xla2"
    )
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.data.synthetic import make_pair
    from mvreg.models.fcgf import build_unet_plan
    from mvreg.ops.sparse_conv import sparse_conv
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    B, P = args.batch, args.points
    caps = [8192, 4096, 2048, 1024]
    chans = [32, 64, 128, 256]
    dt = jnp.dtype(args.dtype)

    pts = np.zeros((B, P, 3), np.float32)
    msk = np.zeros((B, P), bool)
    for b in range(B // 2):
        scene = make_pair(seed=b, points_per_fragment=P)
        pts[2 * b : 2 * b + 2] = scene.points
        msk[2 * b : 2 * b + 2] = scene.mask
    points, mask = jnp.asarray(pts), jnp.asarray(msk)

    plan_tap = jax.jit(
        lambda p, m: build_unet_plan(p, m, 0.025, caps, lookup="sortjoin")
    )(points, mask)
    plan_brick = jax.jit(
        lambda p, m: build_unet_plan(p, m, 0.025, caps, lookup="brick")
    )(points, mask)
    jax.block_until_ready((plan_tap, plan_brick))
    occ = [int(n) for n in np.asarray(plan_tap.counts[0])]
    bmask = [int(np.asarray(m).sum(-1).mean()) for m in
             [jax.tree_util.tree_map(lambda x: x, bp).brick_mask
              for bp in plan_brick.kmaps]]
    print(f"voxels L0 per frag: {occ}; mean bricks/level: {bmask}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    results = {}
    for lvl in [int(x) for x in args.levels.split(",")]:
        V, C = caps[lvl], chans[lvl]
        feats = jnp.asarray(rng.normal(size=(B, V, C)), dt)
        W = jnp.asarray(rng.normal(size=(27, C, C)) * 0.05, dt)
        for impl in args.impls.split(","):
            km = (
                plan_brick.kmaps[lvl]
                if impl.startswith("brick")
                else plan_tap.kmaps[lvl]
            )
            m = (plan_brick if impl.startswith("brick") else plan_tap).masks[lvl]

            def make_chain(iters, km=km, m=m, impl=impl):
                def body(x, _):
                    out = jax.vmap(
                        lambda xx, kk, mm: sparse_conv(
                            xx, kk, W, mm, impl=impl
                        )
                    )(x, km, m)
                    eps = (1e-6 * jnp.mean(out[..., :1, :1])).astype(x.dtype)
                    return x * (1 + eps), ()

                return jax.jit(
                    lambda x: jax.lax.scan(body, x, None, length=iters)[0]
                )

            key = f"L{lvl}:{impl}"
            try:
                f1, fN = make_chain(1), make_chain(args.chain)
                t0 = time.time()
                np.asarray(f1(feats)[0, 0])
                np.asarray(fN(feats)[0, 0])
                compile_s = time.time() - t0
            except Exception as e:
                results[key] = {"error": str(e)[:200]}
                print(key, "FAILED:", str(e)[:200], file=sys.stderr)
                continue

            def med_time(f):
                ts = []
                for r in range(args.reps):
                    x = feats + jnp.asarray(1e-3 * r, dt)
                    t0 = time.perf_counter()
                    np.asarray(f(x)[0, 0])
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts))

            dt1, dtN = med_time(f1), med_time(fN)
            marginal = max((dtN - dt1) / (args.chain - 1), 1e-9)
            results[key] = {
                "ms": round(marginal * 1e3, 3),
                "dispatch_ms": round(dt1 * 1e3, 3),
                "compile_s": round(compile_s, 1),
            }
            print(key, results[key], file=sys.stderr)

    print(json.dumps({"brick_microbench": results,
                      "backend": jax.default_backend(),
                      "batch": B}))


if __name__ == "__main__":
    main()
