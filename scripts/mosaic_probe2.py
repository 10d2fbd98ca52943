#!/usr/bin/env python
"""Mosaic probe round 2: lane-direction gathers + soft-match bisect.

r3_mosaic_probe established: sublane-direction take_along_axis (the conv
kernel's row gather) crashes tpu_compile_helper; 1D gather is cleanly
rejected ("Only 2D gather is supported"). This probe answers:

  lane128 / lane1024 / lane8192
      take_along_axis along the LANE axis on a (C, V) operand with the
      index vector broadcast across sublanes — the transposed-conv
      gather formulation. V spans one (128) vs many lane-register
      groups.
  lanedot
      lane gather + dot_general contracting the sublane dim (the full
      transposed conv tap body: out[v,o] = sum_c g[c,v] W[c,o]).
  soft_alpha / soft_exp
      the two suspect constructs of the soft-match kernel (read-
      modify-write accumulator scaled by a broadcast vector; exp of a
      max-shifted tile), isolated.

Prints one JSON line.
"""

from __future__ import annotations

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

    K = 4
    rng = np.random.default_rng(0)

    def run(name, kernel, in_specs, out_spec, out_shape, args, grid=(K,)):
        t0 = time.time()
        try:
            f = jax.jit(
                pl.pallas_call(
                    kernel,
                    grid=grid,
                    in_specs=in_specs,
                    out_specs=out_spec,
                    out_shape=out_shape,
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",) * len(grid),
                    ),
                    interpret=interpret,
                )
            )
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            res = {"ok": True, "s": round(time.time() - t0, 1)}
        except Exception as e:
            res = {"ok": False, "error": str(e)[:200]}
        print(f"[probe2] {name}: {res}", file=sys.stderr, flush=True)
        return res

    full = lambda *shape: pl.BlockSpec(
        shape, lambda k: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    results = {}

    # --- lane gathers: featsT (C, V), idx (K, V) ---
    def lane_case(name, C, V):
        featsT = jnp.asarray(rng.normal(size=(C, V)), jnp.float32)
        kmap = jnp.asarray(rng.integers(0, V, size=(K, V)), jnp.int32)

        def k_lane(m_ref, x_ref, o_ref):
            k = pl.program_id(0)
            idx = m_ref[k, :]  # (V,)
            xT = x_ref[:]  # (C, V)
            idxm = jnp.broadcast_to(idx[None, :], xT.shape)
            g = jnp.take_along_axis(
                xT, idxm, axis=1, mode="promise_in_bounds"
            )

            @pl.when(k == 0)
            def _():
                o_ref[:] = g

            @pl.when(k > 0)
            def _():
                o_ref[:] = o_ref[:] + g

        results[name] = run(
            name, k_lane, [full(K, V), full(C, V)], full(C, V),
            jax.ShapeDtypeStruct((C, V), jnp.float32), (kmap, featsT),
        )

    lane_case("lane128", 32, 128)
    lane_case("lane1024", 32, 1024)
    lane_case("lane8192", 32, 8192)

    # --- lane gather + transposed GEMM (full conv tap) ---
    C, V, O = 32, 4096, 32
    featsT = jnp.asarray(rng.normal(size=(C, V)), jnp.float32)
    kmap = jnp.asarray(rng.integers(0, V, size=(K, V)), jnp.int32)
    w = jnp.asarray(rng.normal(size=(K, C, O)) * 0.05, jnp.float32)

    def k_lanedot(m_ref, x_ref, w_ref, o_ref):
        k = pl.program_id(0)
        idx = m_ref[k, :]
        xT = x_ref[:]
        idxm = jnp.broadcast_to(idx[None, :], xT.shape)
        g = jnp.take_along_axis(xT, idxm, axis=1, mode="promise_in_bounds")
        # out[v, o] = sum_c g[c, v] W[c, o]
        part = jax.lax.dot_general(
            g, w_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(k == 0)
        def _():
            o_ref[:] = part

        @pl.when(k > 0)
        def _():
            o_ref[:] = o_ref[:] + part

    results["lanedot"] = run(
        "lanedot", k_lanedot,
        [full(K, V), full(C, V),
         pl.BlockSpec((1, C, O), lambda k: (k, 0, 0),
                      memory_space=pltpu.VMEM)],
        full(V, O), jax.ShapeDtypeStruct((V, O), jnp.float32),
        (kmap, featsT, w),
    )

    # --- soft-match bisect ---
    TM, TN, VL = 256, 512, 128
    s_in = jnp.asarray(rng.normal(size=(TM, TN)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(TN, VL)), jnp.float32)

    def k_soft_alpha(s_ref, p_ref, m_ref, acc_ref):
        k = pl.program_id(0)
        s = s_ref[:]
        tile_max = jnp.max(s, axis=1)
        shp = m_ref.shape

        @pl.when(k == 0)
        def _():
            m_ref[:] = tile_max.reshape(shp)
            acc_ref[:] = jnp.dot(
                jnp.exp(s - tile_max[:, None]), p_ref[:],
                preferred_element_type=jnp.float32,
            )

        @pl.when(k > 0)
        def _():
            m_old = m_ref[:].reshape(-1)
            m_new = jnp.maximum(m_old, tile_max)
            alpha = jnp.exp(m_old - m_new)
            m_ref[:] = m_new.reshape(shp)
            acc_ref[:] = acc_ref[:] * alpha[:, None] + jnp.dot(
                jnp.exp(s - m_new[:, None]), p_ref[:],
                preferred_element_type=jnp.float32,
            )

    results["soft_alpha"] = run(
        "soft_alpha", k_soft_alpha, [full(TM, TN), full(TN, VL)],
        [pl.BlockSpec((1, TM // 128, 128), lambda k: (0, 0, 0),
                      memory_space=pltpu.VMEM),
         full(TM, VL)],
        [jax.ShapeDtypeStruct((1, TM // 128, 128), jnp.float32),
         jax.ShapeDtypeStruct((TM, VL), jnp.float32)],
        (s_in, pos),
    )

    print(json.dumps({"backend": jax.default_backend(), **results}))


if __name__ == "__main__":
    main()
