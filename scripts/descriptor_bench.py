#!/usr/bin/env python
"""A/B benchmark of the full descriptor stage across conv schedules.

Measures `extract_descriptors` end-to-end (voxelize + plan build + UNet)
per schedule — the right granularity for choosing `model.conv_impl`,
because the dense-grid schedule also removes the kernel-map construction
that the gather-GEMM schedules pay (SURVEY.md §3.4). Readback barrier per
rep (axon relay: block_until_ready is not a completion barrier).

Usage: python scripts/descriptor_bench.py [--cpu] [--impls fused,dense]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--fragments", type=int, default=8)
    ap.add_argument("--voxel-size", type=float, default=0.025)
    ap.add_argument("--caps", default="8192,4096,2048,1024")
    ap.add_argument("--dense-grid", default="112,112,112")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impls", default="fused,taps,dense")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scan-iters", type=int, default=8,
                    help="chain this many data-dependent UNet passes per "
                    "dispatch; the marginal cost isolates device compute "
                    "from the relay's ~300 ms dispatch/readback floor")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import PipelineConfig, override
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params

    caps = tuple(int(c) for c in args.caps.split(","))
    grid = tuple(int(g) for g in args.dense_grid.split(","))
    F = args.fragments
    pts = np.zeros((F, args.points, 3), np.float32)
    msk = np.zeros((F, args.points), bool)
    for b in range(0, F, 2):
        scene = make_pair(seed=b, points_per_fragment=args.points)
        pts[b : b + 2] = scene.points[: F - b]
        msk[b : b + 2] = scene.mask[: F - b]
    points, mask = jnp.asarray(pts), jnp.asarray(msk)

    results = {}
    for impl in args.impls.split(","):
        cfg = override(
            PipelineConfig(),
            **{
                "voxel.voxel_size": args.voxel_size,
                "voxel.capacities": list(caps),
                "voxel.dense_grid": list(grid),
                "model.compute_dtype": args.dtype,
                "model.conv_impl": impl,
            },
        )
        params = init_params(jax.random.PRNGKey(0), cfg)

        # params passed as a runtime argument (not closure-captured) so
        # weights aren't baked in as compile-time constants — matches how
        # the pipeline/bench.py call it.
        def run_scan(w, p, m, iters):
            # Each pass perturbs the points by a descriptor-dependent
            # epsilon: a true sequential data dependency, so XLA can
            # neither batch nor dead-code-eliminate the chain.
            def body(pts, _):
                d = extract_descriptors(w, cfg, pts, m)
                eps = 1e-6 * jnp.mean(d.feats)
                return pts * (1.0 + eps), d.feats[0, 0, 0]
            return jax.lax.scan(body, p, None, length=iters)[1]

        S = args.scan_iters
        f1 = jax.jit(lambda w, p, m: run_scan(w, p, m, 1))
        fS = jax.jit(lambda w, p, m: run_scan(w, p, m, S))
        try:
            np.asarray(f1(params, points, mask))
            np.asarray(fS(params, points, mask))

            def timed(fn):
                t0 = time.perf_counter()
                for r in range(args.reps):
                    np.asarray(fn(params, points + 1e-4 * r, mask))
                return (time.perf_counter() - t0) / args.reps
            dt1, dtS = timed(f1), timed(fS)
            # Marginal per-pass device time, free of dispatch overhead.
            marginal = max((dtS - dt1) / (S - 1), 1e-9)
        except Exception as e:  # OOM on big grids etc. — report, keep going
            results[impl] = {"error": str(e)[:200]}
            print(impl, "ERROR", str(e)[:200])
            continue
        results[impl] = {
            "ms_per_batch_e2e": round(dt1 * 1e3, 2),
            "ms_per_batch_marginal": round(marginal * 1e3, 2),
            "fragments_per_s_e2e": round(F / dt1, 2),
            "fragments_per_s_marginal": round(F / marginal, 2),
        }
        print(impl, results[impl])

    payload = {
        "descriptor_bench": results,
        "backend": jax.default_backend(),
        "points": args.points,
        "fragments": F,
        "caps": list(caps),
        "dense_grid": list(grid),
        "dtype": args.dtype,
    }
    print(json.dumps(payload))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(payload, fh, indent=2)


if __name__ == "__main__":
    main()
