#!/usr/bin/env python
"""Per-stage wall-clock + FLOPs + MFU breakdown of the pairwise pipeline.

Times each stage as its own jitted program (voxelize+plan, UNet forward,
matching, filtering, robust Procrustes, confidence) with a readback
barrier per rep, and reports each stage's XLA-counted FLOPs and MFU
(FLOPs / time / chip peak) — the VERDICT.md round-1 item-4 accounting:
one table saying how far each stage is from the MXU roof and which
stage is the bottleneck. Stage sums exceed a fused end-to-end time
(XLA overlaps/fuses across stages); use shares to pick targets.

SURVEY.md §5.1: the reference has no profiler integration at all.
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
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--set", action="append", default=[])
    ap.add_argument("--json-out", type=str, default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.core.metrics import transformation_residuals
    from mvreg.core.procrustes import irls_kabsch
    from mvreg.data.synthetic import make_pair
    from mvreg.models.fcgf import build_unet_plan, plan_lookup
    from mvreg.models.filtering import edge_statistics
    from mvreg.ops.knn import mutual_match
    from mvreg.pipeline import (
        init_params, input_features, make_models, select_keypoints,
    )

    cfg = resolve_config(
        None, None,
        [
            "voxel.capacities=(8192,4096,2048,1024)",
            "model.compute_dtype='bfloat16'",
        ]
        + list(args.set),
    )

    params = init_params(jax.random.PRNGKey(0), cfg)
    B = args.pairs
    pts = np.zeros((B * 2, args.points, 3), np.float32)
    msk = np.zeros((B * 2, args.points), bool)
    for b in range(B):
        s = make_pair(seed=b, points_per_fragment=args.points)
        pts[2 * b: 2 * b + 2] = s.points
        msk[2 * b: 2 * b + 2] = s.mask
    points, mask = jnp.asarray(pts), jnp.asarray(msk)
    fcgf, fnet, cnet = make_models(cfg)
    K = cfg.match.num_corr

    # --- stage programs (jitted separately)
    plan_fn = jax.jit(lambda p, m: build_unet_plan(
        p, m, cfg.voxel.voxel_size, cfg.voxel.capacities,
        cfg.voxel.kernel_size, plan_lookup(cfg.model, cfg.voxel)))
    unet_fn = jax.jit(lambda prm, plan: fcgf.apply(
        prm, plan, input_features(plan), train=False))

    def _match(desc_f, desc_m, cen):
        def one(b):
            fd, fc, fm = select_keypoints(
                desc_f[2 * b], cen[2 * b], desc_m[2 * b], K
            )
            idx, _, mut = mutual_match(
                fd, fm, desc_f[2 * b + 1], desc_m[2 * b + 1]
            )
            y = cen[2 * b + 1][idx]
            cm = fm & mut
            return fc * cm[:, None], y * cm[:, None], cm
        return jax.lax.map(one, jnp.arange(B), batch_size=B)

    match_fn = jax.jit(_match)
    filt_fn = jax.jit(lambda prm, corr, cm: fnet.apply(
        prm, corr, cm, train=False))
    solve_fn = jax.jit(lambda x, y, w: jax.vmap(
        lambda xx, yy, ww: irls_kabsch(
            xx, yy, ww, cfg.match.irls_iters, cfg.match.irls_scale))(x, y, w))

    def _conf(prm, w, cm, R, t, x, y):
        res = transformation_residuals(R, t, x, y)
        st = edge_statistics(w, cm, res)
        return cnet.apply(prm, st)

    conf_fn = jax.jit(_conf)

    def bar(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

    def _flops(f, *a):
        try:
            ca = f.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            v = float(ca.get("flops", 0.0))
            return v if v > 0 else None
        except Exception:
            return None

    def timed(name, f, *a):
        out = f(*a)
        bar(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(*a)
            bar(out)
        times[name] = (time.perf_counter() - t0) / args.reps
        flops[name] = _flops(f, *a)
        return out

    times: dict[str, float] = {}
    flops: dict[str, float | None] = {}
    plan = timed("1_voxelize_plan", plan_fn, points, mask)
    desc = timed("2_unet", unet_fn, params.fcgf, plan)
    g = plan.grids[0]
    centers = (g.origin[:, None, :]
               + (g.coords.astype(points.dtype) + 0.5)
               * g.voxel_size[:, None, None]) * plan.masks[0][..., None]
    x, y, cm = timed("3_match", match_fn, desc, plan.masks[0], centers)
    corr = jnp.concatenate([x, y], axis=-1)
    logits, w = timed(
        "4_filter", filt_fn, params.filter, corr, cm.astype(corr.dtype)
    )
    w_eff = w * cm + 1e-3 * cm
    R, t, _ = timed("5_procrustes", solve_fn, x, y, w_eff)
    timed("6_confidence", conf_fn, params.confidence, w, cm.astype(w.dtype),
          R, t, x, y)

    # Stage 7: the full post-descriptor edge program (register_pair with
    # the round-2 robust stack: spectral hypotheses + overlap-RANSAC +
    # ICP polish + verification). Robust-stack overhead = this minus
    # stages 3-6; it is what regressed bench 39.7 -> 29.9 fr/s in
    # round 2 (VERDICT Missing #1) and must be visible in the table.
    from mvreg.pipeline import Descriptors, register_edges

    desc_t = Descriptors(feats=desc, centers=centers, mask=plan.masks[0])
    eidx = jnp.asarray([[2 * b, 2 * b + 1] for b in range(B)], jnp.int32)
    edges_fn = jax.jit(lambda prm, d, e: register_edges(prm, cfg, d, e))
    timed("7_edges_full", edges_fn, params, desc_t, eidx)

    # 7_edges_full CONTAINS stages 3-6; keep it out of the stage total
    # (its share is printed relative to 1+2+7, the true pipeline path).
    total = sum(v for k, v in times.items() if not k.startswith("7"))
    e2e = times.get("1_voxelize_plan", 0) + times.get("2_unet", 0) + \
        times.get("7_edges_full", 0)
    # TPU v5e bf16 matmul peak; override for other chips.
    peak = float(os.environ.get("MVREG_PEAK_FLOPS", 197e12))
    print(f"backend={jax.default_backend()} pairs={B} points={args.points}")
    print(f"  {'stage':18s} {'ms':>9s} {'share':>6s} {'GFLOP':>9s} {'MFU':>7s}")
    for k, v in sorted(times.items()):
        fl = flops.get(k)
        gf = f"{fl / 1e9:9.2f}" if fl else "        -"
        mfu = f"{fl / v / peak * 100:6.2f}%" if fl else "      -"
        den = e2e if k.startswith("7") else total
        print(f"  {k:18s} {v * 1e3:9.2f} {v / den * 100:5.1f}% {gf} {mfu}")
    print(f"  {'sum_of_stages':18s} {total * 1e3:9.2f} ms"
          f"   e2e(1+2+7) {e2e * 1e3:9.2f} ms")
    out = {k: round(v * 1e3, 2) for k, v in times.items()}
    out["flops"] = {k: v for k, v in flops.items() if v}
    out["mfu"] = {
        k: round(flops[k] / times[k] / peak, 5)
        for k in times if flops.get(k)
    }
    out["backend"] = jax.default_backend()
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
