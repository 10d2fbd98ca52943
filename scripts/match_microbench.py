#!/usr/bin/env python
"""A/B microbenchmark: Pallas vs XLA matching kernels on this backend.

VERDICT round-2 item 2: the Pallas layer must be shown working (or
failing, with a minimal repro) on the REAL TPU, compiled — not in
interpret mode. Stages:

  1. `probe`  — a trivial Pallas kernel (tiled add). If THIS fails to
     compile, Mosaic itself is blocked on this toolchain and the repro
     is the probe; every other pallas failure is then uninformative.
  2. `argmin` — ops/pallas/match_argmin vs ops/knn.nn_match at eval
     scale (Na keypoints vs Nb voxel features, D=32), parity-checked.
  3. `mutual` — both directions + mutual flag.
  4. `soft`   — ops/pallas/soft_match vs ops/knn.soft_match.

Readback barrier per rep (axon relay: block_until_ready is not a
completion barrier). Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mark(msg: str) -> None:
    print(f"[matchmb] {msg}", file=sys.stderr, flush=True)


def trivial_probe(interpret: bool):
    """Smallest useful Mosaic program: one tiled elementwise add."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = x_ref[:] + y_ref[:]

    del functools
    x = jnp.arange(1024 * 256, dtype=jnp.float32).reshape(1024, 256)
    call = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[
            pl.BlockSpec((256, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((256, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1024, 256), jnp.float32),
        interpret=interpret,
    )
    f = jax.jit(call)
    import numpy as np

    out = f(x, x)
    np.asarray(out)
    assert float(out[3, 5]) == 2 * float(x[3, 5])
    return True


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--na", type=int, default=2048)
    ap.add_argument("--nb", type=int, default=8192)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8,
                    help="vmapped pair batch (pipeline runs edges batched)")
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    interpret = backend == "cpu"
    results: dict = {"backend": backend, "interpret": interpret,
                     "na": args.na, "nb": args.nb, "batch": args.batch}

    _mark(f"backend={backend} interpret={interpret}")
    t0 = time.time()
    try:
        trivial_probe(interpret)
        results["probe"] = {"ok": True, "s": round(time.time() - t0, 1)}
        _mark(f"probe OK in {time.time()-t0:.1f}s")
    except Exception as e:
        results["probe"] = {"ok": False, "error": str(e)[:500]}
        _mark(f"probe FAILED: {e}")
        print(json.dumps(results))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(results, f, indent=2)
        return

    from mvreg.ops.knn import mutual_match, nn_match, soft_match
    from mvreg.ops.pallas.match_argmin import (
        mutual_match_pallas,
        nn_match_pallas,
    )
    from mvreg.ops.pallas.soft_match import soft_match_pallas

    rng = np.random.default_rng(0)
    B, Na, Nb, D = args.batch, args.na, args.nb, args.dim
    fa = rng.normal(size=(B, Na, D)).astype(np.float32)
    fa /= np.linalg.norm(fa, axis=-1, keepdims=True)
    fb = rng.normal(size=(B, Nb, D)).astype(np.float32)
    fb /= np.linalg.norm(fb, axis=-1, keepdims=True)
    ma = np.ones((B, Na), bool)
    ma[:, -Na // 8:] = False  # padded tail, as in the pipeline
    mb = np.ones((B, Nb), bool)
    mb[:, -Nb // 8:] = False
    pb = rng.normal(size=(B, Nb, 3)).astype(np.float32)
    fa, fb, ma, mb, pb = map(jnp.asarray, (fa, fb, ma, mb, pb))

    def timeit(f, *xs, reps=args.reps):
        out = f(*xs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # barrier
        t0 = time.perf_counter()
        for r in range(reps):
            out = f(*(x for x in xs))
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / reps, out

    cases = {
        "argmin": (
            jax.jit(jax.vmap(lambda a, am, b, bm: nn_match(a, am, b, bm))),
            jax.jit(jax.vmap(
                lambda a, am, b, bm: nn_match_pallas(
                    a, am, b, bm, interpret=interpret)
            )),
            (fa, ma, fb, mb),
        ),
        "mutual": (
            jax.jit(jax.vmap(
                lambda a, am, b, bm: mutual_match(a, am, b, bm))),
            jax.jit(jax.vmap(
                lambda a, am, b, bm: mutual_match_pallas(
                    a, am, b, bm, interpret=interpret)
            )),
            (fa, ma, fb, mb),
        ),
        "soft": (
            jax.jit(jax.vmap(
                lambda a, am, b, bm, p: soft_match(a, am, b, bm, p))),
            jax.jit(jax.vmap(
                lambda a, am, b, bm, p: soft_match_pallas(
                    a, am, b, bm, p, interpret=interpret)
            )),
            (fa, ma, fb, mb, pb),
        ),
    }

    for name, (f_xla, f_pal, xs) in cases.items():
        row: dict = {}
        t0 = time.time()
        try:
            dt_x, out_x = timeit(f_xla, *xs)
            row["xla_ms"] = round(dt_x * 1e3, 3)
            _mark(f"{name} xla {row['xla_ms']} ms "
                  f"(incl compile {time.time()-t0:.1f}s)")
        except Exception as e:
            row["xla_error"] = str(e)[:300]
            _mark(f"{name} xla FAILED: {e}")
        t0 = time.time()
        try:
            dt_p, out_p = timeit(f_pal, *xs)
            row["pallas_ms"] = round(dt_p * 1e3, 3)
            _mark(f"{name} pallas {row['pallas_ms']} ms "
                  f"(incl compile {time.time()-t0:.1f}s)")
        except Exception as e:
            row["pallas_error"] = str(e)[:300]
            _mark(f"{name} pallas FAILED: {e}")
        if "xla_ms" in row and "pallas_ms" in row:
            row["speedup_pallas_over_xla"] = round(dt_x / dt_p, 3)
            # parity on valid rows
            if name in ("argmin", "mutual"):
                ix, ip = np.asarray(out_x[0]), np.asarray(out_p[0])
                valid = np.asarray(ma)
                row["idx_agree"] = round(
                    float((ix == ip)[valid].mean()), 5)
                if name == "mutual":
                    mx, mp = np.asarray(out_x[2]), np.asarray(out_p[2])
                    row["mutual_agree"] = round(
                        float((mx == mp)[valid].mean()), 5)
            else:
                yx, yp = np.asarray(out_x), np.asarray(out_p)
                row["max_abs_diff"] = float(np.abs(yx - yp).max())
        results[name] = row

    print(json.dumps(results))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
