#!/usr/bin/env python
"""Chained-marginal micro-profiler for pipeline sub-stages.

Every number from per-dispatch timing on the axon relay sits on a
~28 ms dispatch floor (RESULTS.md round-3 discovery), so this harness
times every probe with the chained protocol bench.py uses: run the
probe once vs N times inside one lax.scan whose carry feeds back a
data-dependent epsilon (defeats CSE/DCE), and report the marginal
per-iteration time. Probes:

  plan stages     voxelize only / +coarsen / +pools / full plan
  sortbench       raw XLA i32 sort at the kernel-map join sizes
  gatherbench     XLA row-gather cost vs row width (64B .. 4KB)
  edges stages    register_edges under config toggles (spectral /
                  overlap-RANSAC / ICP / full official stack)
  unet            UNet forward on a fixed plan

Usage: python scripts/chain_prof.py --probe plan,sort,gather,edges,unet
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 5


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", type=str, default="plan,edges")
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--points", type=int, default=16384)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--set", action="append", default=[])
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.data.synthetic import make_pair

    probes = set(args.probe.split(","))
    base_over = [
        "voxel.capacities=(8192,4096,2048,1024)",
        "model.compute_dtype='bfloat16'",
        "model.conv_impl='taps'",
        "voxel.lookup='symjoin'",
        "match.backend='xla'",
    ]
    cfg = resolve_config(None, None, base_over + list(args.set))

    B = args.pairs
    pts = np.zeros((B * 2, args.points, 3), np.float32)
    msk = np.zeros((B * 2, args.points), bool)
    for b in range(B):
        s = make_pair(seed=b, points_per_fragment=args.points)
        pts[2 * b: 2 * b + 2] = s.points
        msk[2 * b: 2 * b + 2] = s.mask
    points, mask = jnp.asarray(pts), jnp.asarray(msk)

    results: dict[str, float] = {}

    def bar(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def marginal(name, make_fn, x0):
        """make_fn(iters) -> jitted f(x0); report (tN - t1)/(N-1)."""
        f1, fN = make_fn(1), make_fn(ITERS)
        bar(f1(x0)); bar(fN(x0))  # compile + warm

        def t(f):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                bar(f(x0))
            return (time.perf_counter() - t0) / args.reps

        d1a, dNa = t(f1), t(fN)
        d1b, dNb = t(f1), t(fN)
        d1, dN = min(d1a, d1b), min(dNa, dNb)
        ms = (dN - d1) / (ITERS - 1) * 1e3
        results[name] = round(ms, 3)
        print(f"  {name:28s} {ms:9.2f} ms", flush=True)

    def chain(body):
        """body(pts) -> (out_scalar, aux) — chain via point perturbation."""
        def make(iters):
            def run(p):
                def step(pp, _):
                    s, _aux = body(pp)
                    return pp * (1.0 + 1e-7 * jnp.tanh(s)), s
                return jax.lax.scan(step, p, None, length=iters)[1]
            return jax.jit(run)
        return make

    # ---------------- plan sub-stages ----------------
    if "plan" in probes:
        from mvreg.models.fcgf import build_unet_plan, plan_lookup
        from mvreg.ops import voxel as vx

        offsets = vx.neighbor_offsets(cfg.voxel.kernel_size)
        caps = cfg.voxel.capacities

        def vox_only(p):
            g = jax.vmap(
                lambda q, m: vx.voxelize(q, m, cfg.voxel.voxel_size, caps[0])
            )(p, mask)
            return jnp.sum(g.keys % 97).astype(jnp.float32), None

        def vox_levels(p):
            def one(q, m):
                g = vx.voxelize(q, m, cfg.voxel.voxel_size, caps[0])
                acc = jnp.sum(g.keys % 97)
                for l in range(1, len(caps)):
                    g, pool = vx.coarsen(g, caps[l])
                    acc = acc + jnp.sum(g.keys % 97) + jnp.sum(pool.parent % 89)
                return acc
            return jnp.sum(jax.vmap(one)(p, mask)).astype(jnp.float32), None

        def kmap_l(level, fn=vx.kernel_map_sym):
            def f(p):
                def one(q, m):
                    g = vx.voxelize(q, m, cfg.voxel.voxel_size, caps[0])
                    for l in range(1, level + 1):
                        g, _ = vx.coarsen(g, caps[l])
                    km = fn(g.keys, g.mask, offsets)
                    return jnp.sum(km % 83)
                return (
                    jnp.sum(jax.vmap(one)(p, mask)).astype(jnp.float32),
                    None,
                )
            return f

        def plan_full(p):
            plan = build_unet_plan(
                p, mask, cfg.voxel.voxel_size, caps,
                cfg.voxel.kernel_size, plan_lookup(cfg.model, cfg.voxel),
            )
            s = sum(jnp.sum(k % 83) for k in plan.kmaps)
            return s.astype(jnp.float32), None

        print("plan:")
        marginal("vox_l0", chain(vox_only), points)
        marginal("vox_all_levels", chain(vox_levels), points)
        marginal("levels+kmap_l0", chain(kmap_l(0)), points)
        marginal("levels+kmap_l1", chain(kmap_l(1)), points)
        marginal(
            "levels+kmapPLAIN_l0", chain(kmap_l(0, vx.kernel_map)), points
        )
        marginal("plan_full", chain(plan_full), points)

    # ---------------- raw sort bench ----------------
    if "sort" in probes:
        print("sort (batched 16-fragment i32 key+payload sorts):")
        for n in (16384, 14 * 8192, 14 * 4096, 14 * 2048):
            key = jax.random.PRNGKey(0)
            data = jax.random.randint(
                key, (2 * B, n), 0, 1 << 30, dtype=jnp.int32
            )

            def body(d):
                srt, _ = jax.lax.sort(
                    [d, jnp.broadcast_to(
                        jnp.arange(n, dtype=jnp.int32), d.shape)],
                    num_keys=1, dimension=1, is_stable=False,
                )
                return jnp.sum(srt[:, ::997] % 31).astype(jnp.float32), None

            def make(iters, body=body):
                def run(d):
                    def step(dd, _):
                        s, _a = body(dd)
                        return (
                            dd + (s % 3).astype(jnp.int32) - 1, s
                        )
                    return jax.lax.scan(step, d, None, length=iters)[1]
                return jax.jit(run)

            marginal(f"sort_{2*B}x{n}", make, data)

    # ---------------- gather row-width scaling ----------------
    if "gather" in probes:
        print("gather (batched, 27V rows from (V, C) table):")
        V = 8192
        for C, rows_scale in ((32, 27), (256, 27), (2048, 4)):
            tbl = jax.random.normal(
                jax.random.PRNGKey(1), (2 * B, V * 32 // C, C), jnp.bfloat16
            )
            nrows = tbl.shape[1] * rows_scale
            idx = jax.random.randint(
                jax.random.PRNGKey(2), (2 * B, nrows), 0, tbl.shape[1]
            )

            def body(t, idx=idx):
                g = jnp.take_along_axis(
                    t, idx[..., None] % t.shape[1], axis=1
                )
                return jnp.sum(g[:, ::199, :1].astype(jnp.float32)), None

            def make(iters, body=body):
                def run(t):
                    def step(tt, _):
                        s, _a = body(tt)
                        return (
                            (tt.astype(jnp.float32)
                             * (1.0 + 1e-7 * jnp.tanh(s))
                             ).astype(tt.dtype),
                            s,
                        )
                    return jax.lax.scan(step, t, None, length=iters)[1]
                return jax.jit(run)

            marginal(
                f"gather_rows{nrows}_w{C*2}B", make, tbl
            )

    # ---------------- edges stack toggles ----------------
    if "edges" in probes:
        from mvreg.pipeline import (
            Descriptors, extract_descriptors, init_params, register_edges,
        )
        from mvreg.config.schema import resolve_config as rc

        params = init_params(jax.random.PRNGKey(0), cfg)
        desc = jax.jit(
            lambda p, m: extract_descriptors(params, cfg, p, m)
        )(points, mask)
        desc = jax.tree_util.tree_map(lambda a: jax.device_get(a), desc)
        desc = Descriptors(*[jnp.asarray(a) for a in desc])
        eidx = jnp.asarray(
            [[2 * b, 2 * b + 1] for b in range(B)], jnp.int32
        )

        variants = {
            "e_base(match+filt+irls)": [
                "match.spectral=False", "match.icp_iters=0",
                "match.overlap_ransac_hypotheses=0",
            ],
            "e_base+icp": [
                "match.spectral=False",
                "match.overlap_ransac_hypotheses=0",
            ],
            "e_base+spectral": [
                "match.icp_iters=0",
                "match.overlap_ransac_hypotheses=0",
            ],
            "e_base+oransac": [
                "match.spectral=False", "match.icp_iters=0",
            ],
            "e_official_full": [],
        }
        print("edges (marginal, 8 pairs):")
        for name, extra in variants.items():
            vcfg = rc(None, None, base_over + extra + list(args.set))

            def body(d, vcfg=vcfg):
                out = register_edges(params, vcfg, d, eidx)
                return jnp.sum(out.R) + jnp.sum(out.confidence), out

            def make(iters, body=body):
                def run(d):
                    def step(dd, _):
                        s, _a = body(dd)
                        eps = 1e-6 * jnp.tanh(s)
                        return (
                            dd._replace(
                                centers=dd.centers * (1.0 + eps)
                            ),
                            s,
                        )
                    return jax.lax.scan(step, d, None, length=iters)[1]
                return jax.jit(run)

            marginal(name, make, desc)

    # ---------------- unet ----------------
    if "unet" in probes:
        from mvreg.models.fcgf import build_unet_plan, plan_lookup
        from mvreg.pipeline import init_params, input_features, make_models

        params = init_params(jax.random.PRNGKey(0), cfg)
        fcgf, _, _ = make_models(cfg)
        plan = jax.jit(lambda p, m: build_unet_plan(
            p, m, cfg.voxel.voxel_size, cfg.voxel.capacities,
            cfg.voxel.kernel_size, plan_lookup(cfg.model, cfg.voxel)))(
                points, mask)
        feats0 = input_features(plan)

        def make(iters):
            def run(f):
                def step(ff, _):
                    d = fcgf.apply(params.fcgf, plan, ff, train=False)
                    s = jnp.sum(d)
                    return ff * (1.0 + 1e-7 * jnp.tanh(s)), s
                return jax.lax.scan(step, f, None, length=iters)[1]
            return jax.jit(run)

        print("unet:")
        marginal("unet_forward", make, feats0)

    print(json.dumps(results))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
