#!/usr/bin/env python
"""How does XLA's TPU gather cost scale — rows or elements?

Decides whether a brick-dense (block-sparse) conv plan is worth
building: it replaces taps' 27xV row-gathers of Cin-wide rows with
~27xV/64 gathers of brick-wide (64*Cin) rows — a ~64x row reduction at
~0.6x the elements. If gather cost is per-row, that is a ~60x win on
the UNet's bottleneck; if per-element, ~1.7x.

Chained-scan timing (marginal per iteration; the relay dispatch floor
is ~28 ms). One JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    import jax
    import jax.numpy as jnp

    CH = 8
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend()}
    # constant total elements (~57M bf16), varying row widths
    cases = {
        "rows1.8M_w32": (1_769_472, 32),
        "rows442k_w128": (442_368, 128),
        "rows28k_w2048": (27_648, 2048),
        "rows7k_w8192": (6_912, 8192),
    }
    for name, (rows, width) in cases.items():
        table_rows = max(rows // 4, 1024)
        table = jnp.asarray(
            rng.normal(size=(table_rows, width)), jnp.bfloat16
        )
        idx = jnp.asarray(
            rng.integers(0, table_rows, size=(rows,)), jnp.int32
        )

        def body(c, _):
            t, s = c
            g = jnp.take(t, idx, axis=0)
            s2 = s + jnp.sum(g[:1, :1].astype(jnp.float32))
            # output-dependent perturbation defeats DCE/CSE
            return (t * (1 + 1e-9 * s2.astype(t.dtype)), s2), ()

        def chain(iters):
            return jax.jit(
                lambda t: jax.lax.scan(
                    body, (t, jnp.zeros((), jnp.float32)), None,
                    length=iters,
                )[0][1]
            )

        try:
            f1, fN = chain(1), chain(CH)
            np.asarray(f1(table))
            np.asarray(fN(table))

            def med(f):
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    np.asarray(f(table))
                    ts.append(time.perf_counter() - t0)
                return float(np.median(ts))

            d1, dN = med(f1), med(fN)
            marg = max((dN - d1) / (CH - 1), 1e-9)
            results[name] = {
                "ms": round(marg * 1e3, 3),
                "ns_per_row": round(marg / rows * 1e9, 1),
                "gel_per_s": round(rows * width / marg / 1e9, 2),
            }
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(f"[gather] {name}: {results[name]}", file=sys.stderr,
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
