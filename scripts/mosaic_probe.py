#!/usr/bin/env python
"""Bisect which Mosaic constructs compile on the real TPU.

The fused-gather Pallas conv (ops/pallas/sparse_conv_gather.py) crashes
the relay's tpu_compile_helper with HTTP 500 (r3_convmb_l0.log) while a
trivial kernel compiles fine (r3_matchmb_chip.json: probe ok). This
script compiles a ladder of mini-kernels isolating each suspect
construct and reports ok/error per rung — the minimal-repro evidence
VERDICT round-2 item 2 asks for if a construct is toolchain-blocked.

Rungs:
  base       elementwise add (control — known good)
  dynrow     dynamic row slice ref[k, :] with k = program_id
  gather1d   jnp.take on a 1D vector with int32 indices
  gather2d   take_along_axis row gather with lane-broadcast indices
             (exactly the conv kernel's gather)
  gather_dot gather2d + MXU dot (the full conv tap body)

Prints one JSON line; per-rung logs on stderr.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = "--cpu" in sys.argv
    if interpret:
        jax.config.update("jax_platforms", "cpu")

    V, C = 1024, 128
    K = 8
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(V, C)), jnp.float32)
    kmap = jnp.asarray(rng.integers(0, V, size=(K, V)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(C, C)) * 0.05, jnp.float32)

    def run(name, kernel, in_specs, out_spec, out_shape, args):
        t0 = time.time()
        try:
            f = jax.jit(
                pl.pallas_call(
                    kernel,
                    grid=(K,),
                    in_specs=in_specs,
                    out_specs=out_spec,
                    out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",),
                    ),
                    interpret=interpret,
                )
            )
            out = f(*args)
            np.asarray(out)
            res = {"ok": True, "s": round(time.time() - t0, 1)}
        except Exception as e:
            res = {"ok": False, "error": str(e)[:300]}
        print(f"[probe] {name}: {res}", file=sys.stderr, flush=True)
        return res

    full = lambda *shape: pl.BlockSpec(
        shape, lambda k: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    results = {}

    def k_base(x_ref, o_ref):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            o_ref[:] = x_ref[:] * 2.0

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:] + x_ref[:]

    results["base"] = run(
        "base", k_base, [full(V, C)], full(V, C),
        jax.ShapeDtypeStruct((V, C), jnp.float32), (feats,),
    )

    def k_dynrow(m_ref, o_ref):
        k = pl.program_id(0)
        row = m_ref[k, :]  # (V,) dynamic row slice

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.broadcast_to(
                row.astype(jnp.float32)[:, None], o_ref.shape
            )

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:]

    results["dynrow"] = run(
        "dynrow", k_dynrow, [full(K, V)], full(V, C),
        jax.ShapeDtypeStruct((V, C), jnp.float32), (kmap,),
    )

    def k_gather1d(m_ref, x_ref, o_ref):
        k = pl.program_id(0)
        idx = m_ref[k, :]  # (V,)
        col = x_ref[:, 0]  # (V,)
        g = jnp.take(col, idx, axis=0)

        @pl.when(k == 0)
        def _():
            o_ref[:] = jnp.broadcast_to(g[:, None], o_ref.shape)

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:]

    results["gather1d"] = run(
        "gather1d", k_gather1d, [full(K, V), full(V, C)], full(V, C),
        jax.ShapeDtypeStruct((V, C), jnp.float32), (kmap, feats),
    )

    def k_gather2d(m_ref, x_ref, o_ref):
        k = pl.program_id(0)
        idx = m_ref[k, :]
        feats_ = x_ref[:]
        idxm = jnp.broadcast_to(idx[:, None], feats_.shape)
        g = jnp.take_along_axis(
            feats_, idxm, axis=0, mode="promise_in_bounds"
        )

        @pl.when(k == 0)
        def _():
            o_ref[:] = g

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:] + g

    results["gather2d"] = run(
        "gather2d", k_gather2d, [full(K, V), full(V, C)], full(V, C),
        jax.ShapeDtypeStruct((V, C), jnp.float32), (kmap, feats),
    )

    def k_gather_dot(m_ref, x_ref, w_ref, o_ref):
        k = pl.program_id(0)
        idx = m_ref[k, :]
        feats_ = x_ref[:]
        idxm = jnp.broadcast_to(idx[:, None], feats_.shape)
        g = jnp.take_along_axis(
            feats_, idxm, axis=0, mode="promise_in_bounds"
        )
        part = jnp.dot(g, w_ref[:], preferred_element_type=jnp.float32)

        @pl.when(k == 0)
        def _():
            o_ref[:] = part

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:] + part

    results["gather_dot"] = run(
        "gather_dot", k_gather_dot,
        [full(K, V), full(V, C), full(C, C)], full(V, C),
        jax.ShapeDtypeStruct((V, C), jnp.float32), (kmap, feats, w),
    )

    print(json.dumps({"backend": jax.default_backend(), **results}))


if __name__ == "__main__":
    main()
