#!/usr/bin/env python
"""A/B: does pose-graph GN earn its keep on high-drift graphs?

Round-3 shipped pose_gn default-OFF after losing its A/B at flagship
correspondence quality (dense all-pairs graphs: IRLS+refine+scene-ICP
alone was better). VERDICT r4 item 5 asks for the regime the component
was BUILT for, demonstrated honestly: a long sparse chain (sequential
edges only + a handful of weak long-range loop closures) where
per-edge pose summaries accumulate drift that only a joint
correspondence-level solve can remove.

Construction (sync-layer synthetic, no descriptors — isolates the
solver question):
  * N fragments along a corridor, GT poses drifting in yaw+translation.
  * Edges: (i,i+1), (i,i+2) with K=128 noisy correspondences (sigma
    2 cm, 20% outliers) — good local estimates whose small errors
    compound over the chain.
  * A few long-range edges (i, i+N/2) with only K=12 valid
    correspondences each: too few for a confident pairwise pose
    (their Kabsch estimate is noisy, so sync can only use them as a
    weak averaged constraint), but exactly the raw loop-closure
    information the joint GN can weight optimally.

Output: one JSON with node-pose errors (after gauge alignment to GT)
for IRLS sync alone vs sync + pose_gn.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=40)
    ap.add_argument("--corr", type=int, default=128)
    ap.add_argument("--loop-corr", type=int, default=12)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--outliers", type=float, default=0.2)
    ap.add_argument("--gn-iters", type=int, default=40)
    ap.add_argument("--gn-scale-start", type=float, default=1.0,
                    help="GNC start scale — must exceed the expected "
                         "drift magnitude or loop-closure residuals get "
                         "robust-rejected as outliers")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json-out", default="runs/results/r4_gn_drift_ab.json")
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platform_name", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mvreg.core.procrustes import kabsch
    from mvreg.core.transforms import relative, so3_exp
    from mvreg.sync.irls import synchronize
    from mvreg.sync.pose_gn import pose_graph_gn

    rng = np.random.default_rng(args.seed)
    N, K = args.nodes, args.corr

    # GT absolute poses: corridor with smooth yaw drift
    Rs, ts = [], []
    for i in range(N):
        yaw = 0.15 * np.sin(2 * np.pi * i / N * 1.5)
        Rs.append(np.asarray(so3_exp(jnp.asarray([0.0, 0.0, yaw]))))
        ts.append(np.asarray([1.0 * i, 0.3 * np.sin(i * 0.4), 0.0]))
    R_gt, t_gt = np.stack(Rs), np.stack(ts).astype(np.float32)

    edges = [(i, i + 1) for i in range(N - 1)]
    edges += [(i, i + 2) for i in range(N - 2)]
    loops = [(i, i + N // 2) for i in range(0, N - N // 2, max(N // 6, 1))]
    edges += loops
    E = len(edges)
    e_np = np.asarray(edges, np.int32)
    loop_set = {tuple(e) for e in loops}

    x = np.zeros((E, K, 3), np.float32)
    y = np.zeros((E, K, 3), np.float32)
    w = np.zeros((E, K), np.float32)
    R_pair = np.zeros((E, 3, 3), np.float32)
    t_pair = np.zeros((E, 3), np.float32)
    for e, (i, j) in enumerate(edges):
        k_valid = args.loop_corr if (i, j) in loop_set else K
        # world points in the shared overlap region
        pw = rng.uniform(-1, 1, (K, 3)).astype(np.float32)
        pw[:, 0] += 0.5 * (t_gt[i, 0] + t_gt[j, 0])
        xi = (pw - t_gt[i]) @ R_gt[i]  # frame i
        yj = (pw - t_gt[j]) @ R_gt[j]  # frame j
        xi += args.noise * rng.normal(size=(K, 3))
        yj += args.noise * rng.normal(size=(K, 3))
        out = rng.random(K) < args.outliers
        yj[out] += rng.uniform(-1.5, 1.5, (out.sum(), 3))
        w_e = np.zeros(K, np.float32)
        w_e[:k_valid] = 1.0
        w_e[out] *= 1.0  # outliers stay weighted — robustness is the job
        x[e], y[e], w[e] = xi, yj, w_e
        # pairwise estimate: robust-ish Kabsch on the valid rows
        Re, te = kabsch(jnp.asarray(xi), jnp.asarray(yj), jnp.asarray(w_e))
        # one reweight pass (crude IRLS) to shed outliers
        r = np.linalg.norm(np.asarray(Re) @ xi.T + np.asarray(te)[:, None] - yj.T, axis=0)
        w2 = w_e / (1.0 + (r / 0.05) ** 2)
        Re, te = kabsch(jnp.asarray(xi), jnp.asarray(yj), jnp.asarray(w2))
        R_pair[e], t_pair[e] = np.asarray(Re), np.asarray(te)

    e_j = jnp.asarray(e_np)
    w_edge0 = jnp.ones(E)
    sync = synchronize(
        e_j, jnp.asarray(R_pair), jnp.asarray(t_pair), w_edge0,
        n_nodes=N, num_iters=4,
    )
    # fairness control: extra IRLS iterations alone
    sync8 = synchronize(
        e_j, jnp.asarray(R_pair), jnp.asarray(t_pair), w_edge0,
        n_nodes=N, num_iters=8,
    )
    gn = pose_graph_gn(
        e_j, jnp.asarray(x), jnp.asarray(y), jnp.asarray(w),
        sync.weights, sync, num_iters=args.gn_iters, scale=0.05,
        scale_start=args.gn_scale_start,
    )

    def err(R_est, t_est):
        # gauge-align to GT via node 0
        dR = R_gt[0] @ np.asarray(R_est[0]).T
        dt = t_gt[0] - dR @ np.asarray(t_est[0])
        Ra = np.einsum("ab,nbc->nac", dR, np.asarray(R_est))
        ta = np.einsum("ab,nb->na", dR, np.asarray(t_est)) + dt
        rot = []
        for i in range(N):
            cos = np.clip((np.trace(Ra[i].T @ R_gt[i]) - 1) / 2, -1, 1)
            rot.append(np.degrees(np.arccos(cos)))
        tr = np.linalg.norm(ta - t_gt, axis=-1)
        return {
            "rot_mean_deg": float(np.mean(rot)),
            "rot_max_deg": float(np.max(rot)),
            "trans_mean_m": float(np.mean(tr)),
            "trans_max_m": float(np.max(tr)),
        }

    res = {
        "config": vars(args),
        "edges": E,
        "loop_edges": len(loops),
        "sync_only": err(sync.R, sync.t),
        "sync_8iter": err(sync8.R, sync8.t),
        "sync_plus_gn": err(gn.R, gn.t),
    }
    print(json.dumps(res, indent=2))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
