#!/usr/bin/env python
"""Minimal repro: Pallas match kernel inside vs outside lax.scan on TPU.

Round-3/4 fact: `nn_match_pallas` runs clean in eval-shaped programs
(chunked lax.map over edges — the shipping default) but faults the axon
TPU worker inside bench.py's chained program, reproduced round 4 at the
SMALLEST bench config (pairs=1, SCAN_ITERS=1 — r4_matchfault_p1_i1.log)
— so program SIZE is not the trigger. The structural difference is the
outer `lax.scan` wrapper. This probe isolates exactly that: the same
kernel call on the same shapes, (a) plain jit, (b) jit(scan(length=1)),
(c) jit(scan(length=3)) with a data dependency.

The kernel writes only full blocks (no dynamic indexing, no partial
stores — in-bounds by construction), so a fault here is a toolchain
bug, not an OOB kernel.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops.pallas.match_argmin import nn_match_pallas


def main() -> None:
    Na, Nb, D = 1024, 8192, 32
    rng = np.random.default_rng(0)
    fa = jnp.asarray(rng.normal(size=(Na, D)), jnp.float32)
    fb = jnp.asarray(rng.normal(size=(Nb, D)), jnp.float32)
    ma = jnp.ones(Na, bool)
    mb = jnp.ones(Nb, bool)

    def call(fa):
        idx, d2 = nn_match_pallas(fa, ma, fb, mb)
        return idx, d2

    def run(tag, fn, *args):
        try:
            out = jax.jit(fn)(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            print(f"probe3 {tag}: OK")
            return True
        except Exception as e:
            print(f"probe3 {tag}: FAIL {type(e).__name__}: {str(e)[:140]}")
            return False

    run("plain", call, fa)

    def scan1(fa):
        def body(c, _):
            idx, d2 = call(c)
            eps = 1e-6 * jnp.mean(d2[:8])
            return c * (1 + eps), idx[:4]
        return jax.lax.scan(body, fa, None, length=1)[1]

    run("scan_len1", scan1, fa)

    def scan3(fa):
        def body(c, _):
            idx, d2 = call(c)
            eps = 1e-6 * jnp.mean(d2[:8])
            return c * (1 + eps), idx[:4]
        return jax.lax.scan(body, fa, None, length=3)[1]

    run("scan_len3", scan3, fa)

    # lax.map wrapper (the eval shape, expected OK)
    def mapped(fa):
        def one(k):
            idx, d2 = call(fa + 1e-6 * k)
            return idx[:4]
        return jax.lax.map(one, jnp.arange(2.0))

    run("lax_map", mapped, fa)


if __name__ == "__main__":
    main()
