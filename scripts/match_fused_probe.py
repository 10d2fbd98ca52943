#!/usr/bin/env python
"""Chip probe: fused bidirectional mutual-match kernel (round-5).

Three checks on the real TPU backend:
  1. compiled-mode parity of mutual_match_pallas_fused vs the XLA
     reference and the two-pass Pallas kernel on eval-scale shapes;
  2. chained-marginal timing (the round-3 protocol: per-dispatch timing
     measures the ~28 ms relay floor, not the kernel) of xla vs
     two-pass pallas vs fused pallas;
  3. a scan-wrapped composition (the bench-like context that faulted
     the two-pass kernel in rounds 3-4): 5 chained iterations of
     matching inside lax.scan.

Emits one JSON artifact. Run LAST in a queue — pallas-in-scan is the
historically crash-prone composition.
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
    ap.add_argument("--na", type=int, default=2048)
    ap.add_argument("--nb", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--json-out", type=str,
                    default="runs/results/r5_match_fused_probe.json")
    args = ap.parse_args()

    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.ops.knn import mutual_match
    from mvreg.ops.pallas.match_argmin import (
        mutual_match_pallas,
        mutual_match_pallas_fused,
    )

    out = {"backend": jax.default_backend(), "na": args.na, "nb": args.nb}
    ka, kb = jax.random.split(jax.random.PRNGKey(0))
    fa = jax.random.normal(ka, (args.na, args.dim), jnp.float32)
    fa = fa / jnp.linalg.norm(fa, axis=-1, keepdims=True)
    fb = jax.random.normal(kb, (args.nb, args.dim), jnp.float32)
    fb = fb / jnp.linalg.norm(fb, axis=-1, keepdims=True)
    ma = jnp.arange(args.na) < args.na - 7
    mb = jnp.arange(args.nb) < args.nb - 13

    def readback(r):
        np.asarray(r[0])

    # --- 1. compiled parity
    idx_x, _, mut_x = jax.jit(mutual_match)(fa, ma, fb, mb)
    idx_f, _, mut_f = jax.jit(
        lambda *a: mutual_match_pallas_fused(*a)
    )(fa, ma, fb, mb)
    idx_2, _, mut_2 = jax.jit(
        lambda *a: mutual_match_pallas(*a)
    )(fa, ma, fb, mb)
    parity_fused = bool(
        (np.asarray(idx_f) == np.asarray(idx_x)).all()
        and (np.asarray(mut_f) == np.asarray(mut_x)).all()
    )
    parity_2pass = bool(
        (np.asarray(idx_2) == np.asarray(idx_x)).all()
        and (np.asarray(mut_2) == np.asarray(mut_x)).all()
    )
    out["parity_fused_vs_xla"] = parity_fused
    out["parity_2pass_vs_xla"] = parity_2pass
    print("parity fused:", parity_fused, "| two-pass:", parity_2pass,
          flush=True)

    # --- 2. chained marginal timing
    def chained(f0, fn, iters):
        def body(carry, _):
            f = carry
            idx, d2, mut = fn(f, ma, fb, mb)
            # data-dependent perturbation defeats batching/DCE
            eps = 1e-6 * (d2[0] + idx[0].astype(jnp.float32))
            return f * (1.0 + eps), mut[0]
        return jax.lax.scan(body, f0, None, length=iters)[1]

    results = {}
    for name, fn in (
        ("xla", mutual_match),
        ("pallas2", mutual_match_pallas),
        ("fused", mutual_match_pallas_fused),
    ):
        try:
            f1 = jax.jit(lambda f, fn=fn: chained(f, fn, 1))
            fS = jax.jit(lambda f, fn=fn: chained(f, fn, args.iters))
            readback(f1(fa))
            readback(fS(fa))
            t0 = time.perf_counter()
            for _ in range(3):
                readback(f1(fa))
            d1 = (time.perf_counter() - t0) / 3
            t0 = time.perf_counter()
            for _ in range(3):
                readback(fS(fa))
            dS = (time.perf_counter() - t0) / 3
            ms = (dS - d1) / (args.iters - 1) * 1e3
            results[name] = round(ms, 3)
            print(f"{name}: {ms:.3f} ms marginal per mutual match",
                  flush=True)
        except Exception as e:  # keep probing; record the failure
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: FAILED {e}", flush=True)
    out["marginal_ms"] = results

    with open(args.json_out, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", args.json_out, flush=True)


if __name__ == "__main__":
    main()
