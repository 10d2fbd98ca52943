"""Worker process for the multi-host distributed sync test.

Launched (twice) by tests/test_multihost.py:
    python tests/multihost_worker.py <process_id> <num_processes> <port> <out.npz>

Each process owns a contiguous shard of the pose-graph edges (process-
major order), assembles global arrays, and runs the edge-sharded IRLS
sync over the global mesh. Process 0 saves the (replicated) result.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mvreg.parallel.multihost import (
    global_edge_array,
    global_mesh,
    init_multihost,
    replicated_array,
)


def main() -> None:
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    init_multihost(
        f"127.0.0.1:{port}", num_processes=nproc, process_id=pid,
        cpu_devices_per_process=4,
    )

    import numpy as np

    # Deterministic graph built identically on every process (stands in
    # for each host reading its own data shard).
    rng = np.random.default_rng(0)
    from mvreg.core import transforms as tf
    import jax.numpy as jnp

    N = 12
    key = jax.random.PRNGKey(0)
    R_gt, t_gt = tf.random_rigid(key, (N,), max_translation=2.0)
    pairs = np.array(
        [(i, j) for i in range(N) for j in range(i + 1, N)], np.int32
    )
    E = len(pairs)  # 66
    pad = (-E) % (4 * nproc)
    i, j = pairs[:, 0], pairs[:, 1]
    R_ij, t_ij = tf.relative(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
    R_ij = np.concatenate(
        [np.asarray(R_ij), np.broadcast_to(np.eye(3, dtype=np.float32),
                                           (pad, 3, 3))]
    )
    t_ij = np.concatenate([np.asarray(t_ij), np.zeros((pad, 3), np.float32)])
    edge_idx = np.concatenate(
        [pairs, np.tile(np.array([[0, 1]], np.int32), (pad, 1))]
    )
    c = np.concatenate([np.ones(E, np.float32), np.zeros(pad, np.float32)])
    Eg = E + pad

    mesh = global_mesh()
    lo, hi = pid * Eg // nproc, (pid + 1) * Eg // nproc
    from mvreg.parallel.dist_sync import make_sync_fn

    fn = make_sync_fn(mesh, n_nodes=N, num_edges=Eg, num_iters=4)
    args = (
        global_edge_array(mesh, edge_idx[lo:hi], (Eg, 2)),
        global_edge_array(mesh, R_ij[lo:hi], (Eg, 3, 3)),
        global_edge_array(mesh, t_ij[lo:hi], (Eg, 3)),
        global_edge_array(mesh, c[lo:hi], (Eg,)),
    )
    R, t, w, r = fn(*args)
    # Poses are replicated; every process can read them fully.
    R_np = np.asarray(jax.device_get(R))
    t_np = np.asarray(jax.device_get(t))
    if pid == 0:
        np.savez(
            out_path, R=R_np, t=t_np,
            R_gt=np.asarray(R_gt), t_gt=np.asarray(t_gt),
        )
    print(f"proc {pid} done", flush=True)


if __name__ == "__main__":
    main()
