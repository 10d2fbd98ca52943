#!/usr/bin/env python
"""Distributed multiview benchmark: N processes, edge-sharded sync.

Driver config 4 ("multi-host ScanNet sweep, fragments/edges sharded
across N>=2 hosts, distributed sync via collectives" — BASELINE.md).
The reference has no distributed mode at all (SURVEY.md §2.4).

Spawner mode (default) launches N worker processes on localhost over
jax.distributed + gloo — the exact code path a TPU pod runs over
ICI/DCN, with CPU devices standing in for chips:

  python scripts/benchmark_multiview_dist.py --processes 2 --fragments 8

Each process computes pairwise registrations for ITS contiguous shard of
the C(N,2) edge list only (descriptors are computed per-process for the
fragments its edges touch — work scales out with processes), assembles
global edge-sharded jax.Arrays, and runs the shard_map IRLS sync
(mvreg/parallel/dist_sync.py) where Laplacian blocks move by psum over
the edge axis. Process 0 reports the L2Sync ECDF table.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker(args) -> None:
    from mvreg.parallel.multihost import (
        global_edge_array,
        global_mesh,
        init_multihost,
    )

    init_multihost(
        args.coordinator, args.processes, args.process_id,
        cpu_devices_per_process=args.devices_per_process,
    )

    import numpy as np

    import jax
    import jax.numpy as jnp

    from mvreg.config.schema import resolve_config
    from mvreg.data.synthetic import make_scene
    from mvreg.eval.multiview import (
        format_report,
        pooled_report,
        scene_pairwise_errors,
    )
    from mvreg.parallel.dist_sync import make_sync_fn
    from mvreg.pipeline import (
        all_pairs,
        extract_descriptors,
        init_params,
        register_pair,
    )

    # Checkpoint-saved config wins; the legacy eval preset is only the
    # base for checkpoints that predate config-carrying (or no ckpt).
    saved = args.ckpt and os.path.exists(
        os.path.join(args.ckpt, "config.yaml")
    )
    preset = [] if saved else [
        "voxel.voxel_size=0.05",
        "voxel.capacities=(4096,2048,1024,512)",
    ]
    cfg = resolve_config(None, args.ckpt, preset + list(args.set))

    params = init_params(jax.random.PRNGKey(0), cfg)
    if args.ckpt:
        from mvreg.train.checkpoints import CheckpointManager
        from mvreg.train.loop import registration_params
        from mvreg.train.state import create_train_state

        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = CheckpointManager(args.ckpt).restore(state)
        params = registration_params(state)

    mesh = global_mesh()
    n_dev = mesh.devices.size
    P = args.processes
    pid = args.process_id

    scene_errs = []
    for s in range(args.scenes):
        scene = make_scene(
            seed=1000 + s, num_fragments=args.fragments,
            points_per_fragment=args.points,
        )
        N = args.fragments
        edges = np.asarray(all_pairs(N))  # (E, 2) global order
        E = len(edges)
        # Pad to a multiple of the device count with zero-weight edges.
        E_pad = ((E + n_dev - 1) // n_dev) * n_dev
        pad = E_pad - E

        # This process's contiguous shard of the global (padded) list.
        lo, hi = pid * E_pad // P, (pid + 1) * E_pad // P
        my_edges = [
            tuple(edges[k]) if k < E else (0, 1) for k in range(lo, hi)
        ]

        # Descriptors only for fragments this shard touches.
        needed = sorted({i for e in my_edges for i in e})
        pts = jnp.asarray(scene.points[needed])
        msk = jnp.asarray(scene.mask[needed])
        desc = extract_descriptors(params, cfg, pts, msk)
        slot = {f: k for k, f in enumerate(needed)}

        @jax.jit
        def one_edge(params, di, dj):
            return register_pair(params, cfg, di, dj)

        R_l = np.zeros((hi - lo, 3, 3), np.float32)
        t_l = np.zeros((hi - lo, 3), np.float32)
        c_l = np.zeros((hi - lo,), np.float32)
        for k, (i, j) in enumerate(my_edges):
            di = jax.tree_util.tree_map(lambda a: a[slot[i]], desc)
            dj = jax.tree_util.tree_map(lambda a: a[slot[j]], desc)
            out = one_edge(params, di, dj)
            R_l[k] = np.asarray(out.R)
            t_l[k] = np.asarray(out.t)
            c_l[k] = float(out.confidence) if lo + k < E else 0.0

        eidx_l = np.asarray(my_edges, np.int32)
        g_eidx = global_edge_array(mesh, eidx_l, (E_pad, 2))
        g_R = global_edge_array(mesh, R_l, (E_pad, 3, 3))
        g_t = global_edge_array(mesh, t_l, (E_pad, 3))
        g_c = global_edge_array(mesh, c_l, (E_pad,))

        sync_fn = make_sync_fn(
            mesh, n_nodes=N, num_edges=E_pad,
            num_iters=cfg.sync.num_iters, cauchy_b=cfg.sync.cauchy_b,
            trans_scale=cfg.sync.trans_scale,
            cauchy_b_trans=cfg.sync.cauchy_b_trans,
        )
        R_nodes, t_nodes, _, _ = sync_fn(g_eidx, g_R, g_t, g_c)
        R_n = np.asarray(jax.device_get(R_nodes))
        t_n = np.asarray(jax.device_get(t_nodes))
        err = scene_pairwise_errors(R_n, t_n, scene.R_gt, scene.t_gt)
        scene_errs.append(err)
        if pid == 0:
            print(f"scene {s}: mean rot {err.rot_deg.mean():.2f} deg, "
                  f"mean trans {err.trans_m.mean():.3f} m", flush=True)

    if pid == 0:
        rep = pooled_report(scene_errs)
        print(format_report(rep))
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump({
                    "rot_ecdf": {str(k): v for k, v in rep.rot_ecdf.items()},
                    "trans_ecdf": {
                        str(k): v for k, v in rep.trans_ecdf.items()
                    },
                    "mean_rot_deg": rep.mean_rot_deg,
                    "mean_trans_m": rep.mean_trans_m,
                    "processes": P,
                    "devices": n_dev,
                }, fh, indent=1)


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=int, default=2)
    ap.add_argument("--devices-per-process", type=int, default=4)
    ap.add_argument("--scenes", type=int, default=1)
    ap.add_argument("--fragments", type=int, default=8)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--json-out", type=str, default=None)
    ap.add_argument("--set", action="append", default=[])
    # worker-mode internals
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--coordinator", type=str, default=None)
    args = ap.parse_args()

    if args.process_id is not None:
        worker(args)
        return

    # Spawner: launch N workers on localhost (TPU pods instead launch one
    # process per host with cluster-provided coordinator/IDs).
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never claim the TPU relay
    env["JAX_PLATFORMS"] = "cpu"
    procs = []
    for pid in range(args.processes):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--process-id", str(pid),
            "--coordinator", f"127.0.0.1:{port}",
            "--processes", str(args.processes),
            "--devices-per-process", str(args.devices_per_process),
            "--scenes", str(args.scenes),
            "--fragments", str(args.fragments),
            "--points", str(args.points),
        ]
        if args.ckpt:
            cmd += ["--ckpt", args.ckpt]
        if args.json_out and pid == 0:
            cmd += ["--json-out", args.json_out]
        for kv in args.set:
            cmd += ["--set", kv]
        procs.append(subprocess.Popen(env=env, args=cmd))
    codes = [p.wait() for p in procs]
    if any(codes):
        sys.exit(f"worker failure: exit codes {codes}")


if __name__ == "__main__":
    main()
