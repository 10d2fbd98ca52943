"""Voxel normals + point-to-plane ICP: the subvoxel accuracy stack."""

import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops import voxel as vx
from mvreg.ops.icp import icp_refine
from mvreg.ops.normals import voxel_normals, voxel_normals_l1


def _plane_points(n, seed=0, noise=0.002):
    r = np.random.default_rng(seed)
    return np.c_[
        r.uniform(0, 1.5, (n, 2)), noise * r.normal(size=n)
    ].astype(np.float32)


def test_voxel_normals_on_plane():
    pts = _plane_points(4096)
    g = vx.voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.05, 1024)
    n, w = jax.jit(voxel_normals)(g, jnp.asarray(pts))
    nz = np.abs(np.asarray(n)[np.asarray(g.mask)][:, 2])
    assert nz.mean() > 0.95
    assert float(w[g.mask].mean()) > 0.4
    # unit length wherever there is plane evidence (w > 0); zero rows
    # are the intended "no evidence" signal (under-supported voxels)
    ln = np.linalg.norm(np.asarray(n), axis=-1)
    ev = np.asarray(w) > 0
    assert ev.any()
    assert np.allclose(ln[ev], 1.0, atol=1e-4)


def test_voxel_normals_l1_matches_plane():
    pts = _plane_points(4096, seed=1)
    g = vx.voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.05, 1024)
    g1, pool = vx.coarsen(g, 512)
    km1 = vx.kernel_map(g1.keys, g1.mask, vx.sparse_offsets(27))
    n, w = jax.jit(lambda *a: voxel_normals_l1(*a, 512))(
        g, jnp.asarray(pts), pool, km1
    )
    nz = np.abs(np.asarray(n)[np.asarray(g.mask)][:, 2])
    # single-cell fit (no neighbor aggregation): slightly noisier but
    # gather-free — the shipping default (see voxel_normals_l1 docstring)
    assert nz.mean() > 0.93
    assert float(w[g.mask].mean()) > 0.5
    n2, w2 = jax.jit(
        lambda *a: voxel_normals_l1(*a, 512, neighbor_agg=True)
    )(g, jnp.asarray(pts), pool, km1)
    nz2 = np.abs(np.asarray(n2)[np.asarray(g.mask)][:, 2])
    assert nz2.mean() >= nz.mean() - 0.01  # aggregation only smooths


def test_point_to_plane_beats_point_to_point_on_offset_grids():
    """Offset samplings of a curved surface: p2p floors at the centroid
    mismatch (~cm); p2plane must land well under it."""
    from mvreg.core.transforms import so3_exp
    from mvreg.core.metrics import rotation_error_deg

    def surf(n, seed):
        r = np.random.default_rng(seed)
        xy = r.uniform(0, 2, (n, 2))
        z = 0.15 * np.sin(2 * xy[:, 0]) * np.cos(3 * xy[:, 1])
        return np.c_[xy, z].astype(np.float32)

    A, B = surf(5000, 1), surf(5000, 2)
    Rg = np.asarray(so3_exp(jnp.array([0.01, -0.015, 0.02])))
    tg = np.array([0.03, -0.02, 0.015], np.float32)
    Bw = (B @ Rg.T + tg).astype(np.float32)
    gA = vx.voxelize(jnp.asarray(A), jnp.ones(5000, bool), 0.05, 2048)
    gB = vx.voxelize(jnp.asarray(Bw), jnp.ones(5000, bool), 0.05, 2048)
    cA = vx.average_pool_points(gA, jnp.asarray(A)) * gA.mask[:, None]
    cB = vx.average_pool_points(gB, jnp.asarray(Bw)) * gB.mask[:, None]
    nB, wB = voxel_normals(gB, jnp.asarray(Bw))
    R0, t0 = jnp.eye(3), jnp.zeros(3)
    Rp, tp = icp_refine(R0, t0, cA, gA.mask, cB, gB.mask, num_iters=6)
    Rpl, tpl = icp_refine(
        R0, t0, cA, gA.mask, cB, gB.mask, num_iters=3,
        y_normals=nB, y_nweight=wB, plane_iters=4,
    )
    e_p = float(jnp.linalg.norm(tp - tg))
    e_pl = float(jnp.linalg.norm(tpl - tg))
    assert e_pl < 0.005, (e_p, e_pl)
    assert e_pl < e_p
    assert float(rotation_error_deg(Rpl, jnp.asarray(Rg))) < 0.2
