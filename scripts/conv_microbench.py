#!/usr/bin/env python
"""A/B microbenchmark of sparse_conv schedules on the current backend.

The sparse UNet is the pipeline's hot path (SURVEY.md §3.4); the three
schedules in ops/sparse_conv differ in HBM traffic and MXU shape, and the
winner depends on the hardware — measure, don't guess. Readback barrier
per rep (axon relay: block_until_ready is not a completion barrier).
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
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--voxels", type=int, default=8192)
    ap.add_argument("--cin", type=int, default=128)
    ap.add_argument("--cout", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--ktaps", type=int, default=27,
                    help="kernel support (gather rows scale with K)")
    ap.add_argument("--impls", default="fused,taps,einsum,pallas,pallas2")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.ops.sparse_conv import sparse_conv

    B, V, K = args.batch, args.voxels, args.ktaps
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, V, args.cin)), dt)
    # realistic kernel map: ~50% hit rate, near-diagonal structure
    base = np.arange(V)[None, :] + rng.integers(-40, 40, size=(K, V))
    kmap = np.where(rng.random((K, V)) < 0.5, np.clip(base, 0, V - 1), -1)
    kmap = jnp.asarray(np.broadcast_to(kmap, (B, K, V)).copy(), jnp.int32)
    W = jnp.asarray(rng.normal(size=(K, args.cin, args.cout)) * 0.05, dt)
    mask = jnp.ones((B, V), bool)

    # Chained timing: N data-dependent conv applications inside ONE
    # dispatch (lax.scan), marginal per-iteration time reported. A
    # per-dispatch protocol measures the host/relay round trip instead
    # (~28 ms on the axon relay — every r2/r3 microbench number before
    # this fix sat on that floor and the schedules looked identical).
    CH = 8  # chained iterations

    def make_chain(impl, iters):
        def body(x, _):
            out = jax.vmap(
                lambda xx, kk, mm: sparse_conv(xx, kk, W, mm, impl=impl)
            )(x, kmap, mask)
            # output-dependent epsilon defeats CSE/DCE across iterations
            eps = (1e-6 * jnp.mean(out[..., :1, :1])).astype(x.dtype)
            return x * (1 + eps), ()

        return jax.jit(
            lambda x: jax.lax.scan(body, x, None, length=iters)[0]
        )

    results = {}
    for impl in args.impls.split(","):
        try:
            f1 = make_chain(impl, 1)
            fN = make_chain(impl, CH)
            np.asarray(f1(feats)[0, 0])
            np.asarray(fN(feats)[0, 0])
        except Exception as e:  # e.g. Mosaic lowering limits
            results[impl] = {"error": str(e)[:200]}
            print(impl, "FAILED:", str(e)[:200])
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
        marginal = max((dtN - dt1) / (CH - 1), 1e-9)
        gflops = 2 * B * V * K * args.cin * args.cout / marginal / 1e9
        results[impl] = {"ms": round(marginal * 1e3, 3),
                         "dispatch_ms": round(dt1 * 1e3, 3),
                         "gflops": round(gflops, 1)}
        print(impl, results[impl])
    print(json.dumps({"conv_microbench": results,
                      "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
