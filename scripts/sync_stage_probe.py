#!/usr/bin/env python
"""Stage-isolated sync probe for the round-5 v9k7 mv30 collapse.

diagnose_scene says the gated edge graph is clean (median 3 deg on
overlap edges, junk suppressed to ~1e-9 relative weight) yet post-sync
relative poses read ~96 deg. This probe re-runs the scene pipeline and
measures the GAUGE-INVARIANT pose error after each sync-stack stage —
spectral rotation init, full IRLS sync (with / without cycle gate),
and IRLS under oracle weights — to pin the first stage that diverges.

Runs staged like diagnose_scene (CPU-friendly; xla matching).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--fragments", type=int, default=30)
    ap.add_argument("--points", type=int, default=6144)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--set", action="append", default=[])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mvreg.config.schema import resolve_config
    from mvreg.data.synthetic import make_scene
    from mvreg.eval.multiview import scene_pairwise_errors
    from mvreg.pipeline import (
        all_pairs,
        extract_descriptors,
        initial_edge_weights,
        register_edges,
    )
    from mvreg.sync.cycles import cycle_consistency_scores
    from mvreg.sync.irls import synchronize
    from mvreg.sync.laplacian import connection_laplacian
    from mvreg.sync.irls import rotation_sync_from_laplacian
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.loop import registration_params
    from mvreg.train.state import create_train_state
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = resolve_config(None, args.ckpt, args.set)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    state = CheckpointManager(args.ckpt).restore(state)
    params = registration_params(state)
    print("loaded step", int(state.step), flush=True)

    t0 = time.time()
    N = args.fragments
    scene = make_scene(
        args.seed, num_fragments=N, points_per_fragment=args.points
    )
    pts, msk = jnp.asarray(scene.points), jnp.asarray(scene.mask)
    desc = jax.jit(lambda p, x, m: extract_descriptors(p, cfg, x, m))(
        params, pts, msk
    )
    np.asarray(desc.feats[0, 0])
    print(f"[+{time.time()-t0:.0f}s] descriptors", flush=True)

    edge_idx = np.asarray(all_pairs(N))
    E = edge_idx.shape[0]
    CH = int(cfg.match.edge_batch)
    edges_fn = jax.jit(lambda p, d, e: register_edges(p, cfg, d, e))
    chunks = []
    for k0 in range(0, E, CH):
        chunk = edge_idx[k0 : k0 + CH]
        pad = CH - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.int32)])
        out = edges_fn(params, desc, jnp.asarray(chunk))
        chunks.append(
            jax.tree_util.tree_map(lambda a: a[: CH - pad], out)
        )
    pairs = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *chunks
    )
    np.asarray(pairs.confidence)
    print(f"[+{time.time()-t0:.0f}s] {E} edges", flush=True)

    # ---- GT relative poses (frame i -> j): T_ij = T_j^-1 T_i
    Rg, tg = np.asarray(scene.R_gt), np.asarray(scene.t_gt)
    i_, j_ = edge_idx[:, 0], edge_idx[:, 1]
    R_rel = np.einsum("eba,ebc->eac", Rg[j_], Rg[i_])
    Rp = np.asarray(pairs.R)
    rot_err = np.degrees(
        np.arccos(
            np.clip(
                (np.einsum("eij,eij->e", Rp, R_rel) - 1.0) * 0.5, -1, 1
            )
        )
    )
    good = rot_err < 10.0

    np.savez(
        "runs/results/r5_syncprobe_pairs.npz",
        edge_idx=edge_idx,
        R=np.asarray(pairs.R), t=np.asarray(pairs.t),
        confidence=np.asarray(pairs.confidence),
        overlap=np.asarray(pairs.overlap),
        R_gt=Rg, t_gt=tg,
    )
    w0 = np.asarray(initial_edge_weights(cfg, pairs))
    cyc = np.asarray(
        cycle_consistency_scores(
            pairs.R, pairs.t, jnp.asarray(w0), N,
            tau_rot_deg=cfg.sync.cycle_tau_rot,
            tau_trans=cfg.sync.cycle_tau_trans,
        )
    )
    w_cyc = w0 * cyc ** cfg.sync.cycle_power

    report = {"stages": {}, "edge_stats": {
        "edges": int(E),
        "good_edges(rot<10)": int(good.sum()),
        "w0_mean_good": float(w0[good].mean()),
        "w0_mean_bad": float(w0[~good].mean()) if (~good).any() else 0.0,
        "wcyc_mean_good": float(w_cyc[good].mean()),
        "wcyc_mean_bad": (
            float(w_cyc[~good].mean()) if (~good).any() else 0.0
        ),
        "pair_rot_err_median_good": float(np.median(rot_err[good])),
    }}
    print(report["edge_stats"], flush=True)

    ei = jnp.asarray(edge_idx)

    def stage(label, R_abs, t_abs):
        err = scene_pairwise_errors(
            np.asarray(R_abs), np.asarray(t_abs), Rg, tg
        )
        row = {
            "mean_rot_deg": float(np.mean(err.rot_deg)),
            "median_rot_deg": float(np.median(err.rot_deg)),
            "median_trans_m": float(np.median(err.trans_m)),
        }
        report["stages"][label] = row
        print(f"[stage] {label}: {row}", flush=True)
        print(f"  R_est[1]=\n{np.asarray(R_abs)[1]}", flush=True)

    # spectral-only rotation init (no IRLS), on both weight sets
    for label, w in [("spectral_w0", w0), ("spectral_wcyc", w_cyc),
                     ("spectral_oracle", good.astype(np.float32))]:
        L = connection_laplacian(ei, pairs.R, jnp.asarray(w), N)
        R_init = rotation_sync_from_laplacian(L, N)
        stage(label, R_init, np.zeros((N, 3)))

    # full IRLS sync on each weight set
    for label, w in [("irls_w0", w0), ("irls_wcyc", w_cyc),
                     ("irls_oracle", good.astype(np.float32))]:
        sy = synchronize(
            ei, pairs.R, pairs.t, jnp.asarray(w), N,
            num_iters=cfg.sync.num_iters,
            cauchy_b=cfg.sync.cauchy_b,
            trans_scale=cfg.sync.trans_scale,
            cauchy_b_trans=cfg.sync.cauchy_b_trans,
        )
        stage(label, sy.R, sy.t)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", args.json_out)


if __name__ == "__main__":
    main()
