#!/usr/bin/env python
"""Second-stage repro: Pallas match + sparse-conv UNet in ONE program.

mosaic_probe3 showed the match kernel alone is fine under scan AND map;
bench.py still faults at pairs=1, chain=1. The remaining structural
difference to the (working) eval programs: bench jits descriptor
extraction AND matching into a single XLA program. This probe builds
that composition at small scale and grows it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from mvreg.config.schema import PipelineConfig, override
    from mvreg.data.synthetic import make_pair
    from mvreg.pipeline import extract_descriptors, init_params
    from mvreg.ops.pallas.match_argmin import nn_match_pallas

    cfg = override(
        PipelineConfig(),
        **{
            "voxel.capacities": [8192, 4096, 2048, 1024],
            "voxel.voxel_size": 0.025,
            "model.channels": [32, 64, 128, 256],
            "model.compute_dtype": "bfloat16",
            "model.conv_impl": "taps",
            "match.icp_plane_iters": 0,
            "sync.scene_icp_plane_rounds": 0,
        },
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    sc = make_pair(seed=0, points_per_fragment=16384)
    pts, msk = jnp.asarray(sc.points), jnp.asarray(sc.mask)

    def run(tag, fn, *args):
        try:
            out = jax.jit(fn)(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            print(f"probe4 {tag}: OK", flush=True)
            return True
        except Exception as e:
            print(
                f"probe4 {tag}: FAIL {type(e).__name__}: {str(e)[:120]}",
                flush=True,
            )
            return False

    # rung A: descriptors alone (no kernel)
    def desc_only(params, pts, msk):
        d = extract_descriptors(params, cfg, pts, msk)
        return d.feats[:, :4, :4]

    run("desc_only", desc_only, params, pts, msk)

    # rung B: descriptors + pallas match, ONE jit (the bench shape)
    def desc_match(params, pts, msk):
        d = extract_descriptors(params, cfg, pts, msk)
        idx, d2 = nn_match_pallas(
            d.feats[0][:1024], d.mask[0][:1024], d.feats[1], d.mask[1]
        )
        return idx[:8], d2[:8]

    run("desc_match_1jit", desc_match, params, pts, msk)

    # rung C: same but two separate jits (the eval shape)
    try:
        d = jax.jit(
            lambda p, x, m: extract_descriptors(p, cfg, x, m)
        )(params, pts, msk)
        np.asarray(d.feats[0, 0])
        out = jax.jit(
            lambda f, m, g, n: nn_match_pallas(f[:1024], m[:1024], g, n)
        )(d.feats[0], d.mask[0], d.feats[1], d.mask[1])
        np.asarray(out[0][:4])
        print("probe4 desc_match_2jit: OK", flush=True)
    except Exception as e:
        print(
            f"probe4 desc_match_2jit: FAIL {type(e).__name__}: "
            f"{str(e)[:120]}", flush=True,
        )

    # rung D: rung B inside a length-1 scan (exact bench wrapper)
    def desc_match_scan(params, pts, msk):
        def body(c, _):
            d = extract_descriptors(params, cfg, c, msk)
            idx, d2 = nn_match_pallas(
                d.feats[0][:1024], d.mask[0][:1024], d.feats[1], d.mask[1]
            )
            eps = 1e-6 * jnp.mean(d2[:8])
            return c * (1 + eps), idx[:8]
        return jax.lax.scan(body, pts, None, length=1)[1]

    run("desc_match_scan1", desc_match_scan, params, pts, msk)


if __name__ == "__main__":
    main()
