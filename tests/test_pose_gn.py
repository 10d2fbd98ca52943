"""Global pose-graph Gauss-Newton (sync/pose_gn.py) unit tests.

Oracle style follows SURVEY.md §4: closed-form geometry — generate GT
absolute poses and exact correspondences, perturb, and require recovery
of the gauge-invariant relative poses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvreg.core.metrics import rotation_error_deg
from mvreg.core.transforms import random_rotation, relative
from mvreg.sync.irls import SyncResult
from mvreg.sync.pose_gn import pose_graph_gn


def _make_graph(key, n=6, k=64, noise=0.0, outlier_frac=0.0):
    """GT poses + exact correspondences per edge from shared world points."""
    keys = jax.random.split(key, 6)
    R_gt = random_rotation(keys[0], (n,))
    t_gt = jax.random.uniform(keys[1], (n, 3), minval=-1.0, maxval=1.0)
    edges = np.array(
        [(i, j) for i in range(n) for j in range(i + 1, n)], np.int32
    )
    E = len(edges)
    p_world = jax.random.uniform(keys[2], (E, k, 3), minval=-1.0, maxval=1.0)
    i, j = edges[:, 0], edges[:, 1]
    # local coords: x = R_i^T (p - t_i)
    def loc(Rn, tn):
        return jnp.einsum("eba,ekb->eka", Rn, p_world - tn[:, None, :])

    x = loc(R_gt[i], t_gt[i])
    y = loc(R_gt[j], t_gt[j])
    if noise > 0:
        y = y + noise * jax.random.normal(keys[3], y.shape)
    w = jnp.ones((E, k))
    if outlier_frac > 0:
        out = jax.random.uniform(keys[4], (E, k)) < outlier_frac
        y = jnp.where(out[..., None],
                      y + jax.random.normal(keys[5], y.shape), y)
    return edges, x, y, w, R_gt, t_gt


def _rel_errors(R, t, R_gt, t_gt):
    n = R.shape[0]
    rot, tr = [], []
    for i in range(n):
        for j in range(i + 1, n):
            Re, te = relative(R[i], t[i], R[j], t[j])
            Rg, tg = relative(R_gt[i], t_gt[i], R_gt[j], t_gt[j])
            rot.append(float(rotation_error_deg(Re, Rg)))
            tr.append(float(jnp.linalg.norm(te - tg)))
    return np.array(rot), np.array(tr)


def _perturb(key, R_gt, t_gt, rot_deg=8.0, trans=0.15):
    n = R_gt.shape[0]
    k1, k2 = jax.random.split(key)
    ax = jax.random.normal(k1, (n, 3))
    ax = ax / jnp.linalg.norm(ax, axis=-1, keepdims=True)
    ang = np.radians(rot_deg)
    from mvreg.sync.pose_gn import _exp_so3

    Rp = _exp_so3(ax * ang) @ R_gt
    tp = t_gt + trans * jax.random.normal(k2, (n, 3))
    # keep node 0 at GT: the gauge is pinned there
    Rp = Rp.at[0].set(R_gt[0])
    tp = tp.at[0].set(t_gt[0])
    return Rp, tp


def test_exact_recovery():
    edges, x, y, w, R_gt, t_gt = _make_graph(jax.random.PRNGKey(0))
    Rp, tp = _perturb(jax.random.PRNGKey(1), R_gt, t_gt)
    rot0, tr0 = _rel_errors(Rp, tp, R_gt, t_gt)
    sync0 = SyncResult(R=Rp, t=tp, weights=jnp.ones(len(edges)),
                       residuals=jnp.zeros(len(edges)))
    out = jax.jit(
        lambda s: pose_graph_gn(
            jnp.asarray(edges), x, y, w, jnp.ones(len(edges)), s,
            num_iters=8,
        )
    )(sync0)
    rot, tr = _rel_errors(out.R, out.t, R_gt, t_gt)
    assert np.median(rot0) > 1.0  # the perturbation was real
    assert rot.max() < 0.05, rot.max()
    assert tr.max() < 1e-3, tr.max()
    dets = np.linalg.det(np.asarray(out.R))
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)


def test_robust_to_outliers():
    edges, x, y, w, R_gt, t_gt = _make_graph(
        jax.random.PRNGKey(2), k=128, noise=0.005, outlier_frac=0.3
    )
    Rp, tp = _perturb(jax.random.PRNGKey(3), R_gt, t_gt, 5.0, 0.1)
    sync0 = SyncResult(R=Rp, t=tp, weights=jnp.ones(len(edges)),
                       residuals=jnp.zeros(len(edges)))
    out = pose_graph_gn(
        jnp.asarray(edges), x, y, w, jnp.ones(len(edges)), sync0,
        num_iters=10, scale=0.05,
    )
    rot, tr = _rel_errors(out.R, out.t, R_gt, t_gt)
    assert np.median(rot) < 0.5, np.median(rot)
    assert np.median(tr) < 0.02, np.median(tr)


def test_corrects_collective_warp():
    """The round-2 failure mode: smooth correlated translation drift that
    per-edge/per-node local refinement cannot see."""
    edges, x, y, w, R_gt, t_gt = _make_graph(jax.random.PRNGKey(4), n=8)
    # warp: translation offset growing smoothly with node index
    drift = jnp.asarray(
        np.outer(np.arange(8) / 7.0, np.array([0.3, -0.2, 0.25]))
    ).astype(jnp.float32)
    tp = t_gt + drift - drift[0]
    sync0 = SyncResult(R=R_gt, t=tp, weights=jnp.ones(len(edges)),
                       residuals=jnp.zeros(len(edges)))
    rot0, tr0 = _rel_errors(R_gt, tp, R_gt, t_gt)
    assert tr0.max() > 0.2
    out = pose_graph_gn(
        jnp.asarray(edges), x, y, w, jnp.ones(len(edges)), sync0,
        num_iters=6,
    )
    _, tr = _rel_errors(out.R, out.t, R_gt, t_gt)
    assert tr.max() < 1e-3, tr.max()


def test_padded_edges_and_rows_ignored():
    edges, x, y, w, R_gt, t_gt = _make_graph(jax.random.PRNGKey(5), n=5)
    E = len(edges)
    # poison half the correspondences of edge 0 but zero their weights
    y = y.at[0, :32].add(100.0)
    w = w.at[0, :32].set(0.0)
    # add a padded edge with garbage measurements and zero edge weight
    edges_p = np.concatenate([edges, [[0, 1]]]).astype(np.int32)
    x_p = jnp.concatenate([x, 1e3 * jnp.ones((1,) + x.shape[1:])])
    y_p = jnp.concatenate([y, -1e3 * jnp.ones((1,) + y.shape[1:])])
    w_p = jnp.concatenate([w, jnp.ones((1, w.shape[1]))])
    w_edge = jnp.concatenate([jnp.ones(E), jnp.zeros(1)])
    Rp, tp = _perturb(jax.random.PRNGKey(6), R_gt, t_gt, 4.0, 0.08)
    sync0 = SyncResult(R=Rp, t=tp, weights=w_edge,
                       residuals=jnp.zeros(E + 1))
    out = pose_graph_gn(
        jnp.asarray(edges_p), x_p, y_p, w_p, w_edge, sync0, num_iters=8
    )
    rot, tr = _rel_errors(out.R, out.t, R_gt, t_gt)
    assert rot.max() < 0.1 and tr.max() < 5e-3
    assert np.isfinite(np.asarray(out.t)).all()


def test_sharded_matches_single():
    """Edge-sharded assembly (psum of H, g) == single-device GN."""
    from functools import partial

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from mvreg.parallel.mesh import EDGE_AXIS, make_mesh

    mesh = make_mesh(n_edge=4)
    edges, x, y, w, R_gt, t_gt = _make_graph(jax.random.PRNGKey(7), n=9)
    E = len(edges)  # 36, divisible by 4
    ndev = mesh.shape[EDGE_AXIS]
    assert E % ndev == 0
    Rp, tp = _perturb(jax.random.PRNGKey(8), R_gt, t_gt)
    sync0 = SyncResult(R=Rp, t=tp, weights=jnp.ones(E),
                       residuals=jnp.zeros(E))
    ref = pose_graph_gn(
        jnp.asarray(edges), x, y, w, jnp.ones(E), sync0, num_iters=4
    )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS), P(EDGE_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(eidx_l, x_l, y_l, w_l):
        out = pose_graph_gn(
            eidx_l, x_l, y_l, w_l, jnp.ones(eidx_l.shape[0]),
            SyncResult(R=Rp, t=tp, weights=jnp.ones(eidx_l.shape[0]),
                       residuals=jnp.zeros(eidx_l.shape[0])),
            num_iters=4, axis_name=EDGE_AXIS, num_nodes=9,
        )
        return out.R, out.t

    R_sh, t_sh = jax.jit(run)(jnp.asarray(edges), x, y, w)
    np.testing.assert_allclose(np.asarray(R_sh), np.asarray(ref.R),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(t_sh), np.asarray(ref.t),
                               atol=2e-4)
