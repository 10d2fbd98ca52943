import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops import voxel as vx
from mvreg.ops.sparse_conv import (
    dense_conv_reference,
    sparse_conv,
    sparse_conv_down,
    sparse_conv_up,
)


def _random_sparse_grid(key, n_points=300, span=8, capacity=256):
    pts = jax.random.uniform(key, (n_points, 3), minval=0.0, maxval=span * 0.1)
    grid = vx.voxelize(pts, jnp.ones(n_points, bool), 0.1, capacity)
    return grid


def test_sparse_conv_matches_dense():
    key = jax.random.PRNGKey(0)
    grid = _random_sparse_grid(key)
    V = grid.keys.shape[0]
    Cin, Cout, ks = 4, 6, 3
    feats = jax.random.normal(jax.random.PRNGKey(1), (V, Cin))
    feats = feats * grid.mask[:, None]
    offsets = vx.neighbor_offsets(ks)
    kmap = vx.kernel_map(grid.keys, grid.mask, offsets)
    W = jax.random.normal(jax.random.PRNGKey(2), (ks**3, Cin, Cout)) * 0.1

    out = sparse_conv(feats, kmap, W, grid.mask)

    W_dense = W.reshape(ks, ks, ks, Cin, Cout)
    out_ref = dense_conv_reference(
        grid.coords, grid.mask, feats, W_dense, ks, (16, 16, 16)
    )
    np.testing.assert_allclose(
        np.asarray(out[grid.mask]), np.asarray(out_ref[grid.mask]), atol=1e-4
    )


def test_sparse_conv_kernel5():
    key = jax.random.PRNGKey(3)
    grid = _random_sparse_grid(key, n_points=150)
    V = grid.keys.shape[0]
    Cin, Cout, ks = 3, 5, 5
    feats = jax.random.normal(jax.random.PRNGKey(4), (V, Cin)) * grid.mask[:, None]
    kmap = vx.kernel_map(grid.keys, grid.mask, vx.neighbor_offsets(ks))
    W = jax.random.normal(jax.random.PRNGKey(5), (ks**3, Cin, Cout)) * 0.1
    out = sparse_conv(feats, kmap, W, grid.mask)
    out_ref = dense_conv_reference(
        grid.coords, grid.mask, feats, W.reshape(ks, ks, ks, Cin, Cout), ks,
        (16, 16, 16),
    )
    np.testing.assert_allclose(
        np.asarray(out[grid.mask]), np.asarray(out_ref[grid.mask]), atol=1e-4
    )


def test_sparse_conv_padded_rows_zero():
    grid = _random_sparse_grid(jax.random.PRNGKey(6))
    V = grid.keys.shape[0]
    feats = jax.random.normal(jax.random.PRNGKey(7), (V, 4))
    kmap = vx.kernel_map(grid.keys, grid.mask, vx.neighbor_offsets(3))
    W = jax.random.normal(jax.random.PRNGKey(8), (27, 4, 4))
    out = sparse_conv(feats, kmap, W, grid.mask)
    assert not np.asarray(out[~grid.mask]).any()


def test_down_up_adjoint():
    """conv_down with W and conv_up with W must be exact adjoints."""
    grid = _random_sparse_grid(jax.random.PRNGKey(9))
    coarse, pool = vx.coarsen(grid, capacity=128)
    Vf, Vc = grid.keys.shape[0], 128
    Cin, Cout = 5, 7
    W = jax.random.normal(jax.random.PRNGKey(10), (8, Cin, Cout))
    xf = jax.random.normal(jax.random.PRNGKey(11), (Vf, Cin)) * grid.mask[:, None]
    yc = jax.random.normal(jax.random.PRNGKey(12), (Vc, Cout)) * coarse.mask[:, None]
    down = sparse_conv_down(xf, pool, W, Vc)
    up = sparse_conv_up(yc, pool, jnp.swapaxes(W, -1, -2), grid.mask)
    # <down(x), y> == <x, up(y)>
    lhs = float(jnp.vdot(down, yc))
    rhs = float(jnp.vdot(xf, up))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_down_matches_manual():
    # 2 fine voxels in one parent, 1 in another
    coords = jnp.array([[0, 0, 0], [1, 1, 1], [2, 0, 0]], jnp.int32)
    keys = jnp.concatenate(
        [jnp.sort(vx.pack_coords(coords)), jnp.full((1,), vx.SENTINEL, jnp.int32)]
    )
    grid = vx.VoxelGrid(
        keys=keys, coords=vx.unpack_coords(keys), mask=jnp.arange(4) < 3,
        point2voxel=jnp.zeros(1, jnp.int32), point_mask=jnp.ones(1, bool),
        origin=jnp.zeros(3), voxel_size=jnp.asarray(0.05),
        num_voxels=jnp.asarray(3, jnp.int32),
    )
    coarse, pool = vx.coarsen(grid, capacity=4)
    feats = jnp.array([[1.0], [2.0], [4.0]])
    feats = jnp.concatenate([feats, jnp.zeros((1, 1))])
    W = jnp.ones((8, 1, 1))  # sum over children
    out = sparse_conv_down(feats, pool, W, 4)
    vals = np.sort(np.asarray(out[coarse.mask]).ravel())
    # parent(0,0,0) gets 1+2=3, parent(1,0,0) gets 4
    np.testing.assert_allclose(vals, [3.0, 4.0])


def test_sparse_conv_grad_and_vmap():
    grids = [_random_sparse_grid(jax.random.PRNGKey(s), capacity=128)
             for s in (13, 14)]
    kmaps = jnp.stack(
        [vx.kernel_map(g.keys, g.mask, vx.neighbor_offsets(3)) for g in grids]
    )
    masks = jnp.stack([g.mask for g in grids])
    feats = jax.random.normal(jax.random.PRNGKey(15), (2, 128, 4))
    W = jax.random.normal(jax.random.PRNGKey(16), (27, 4, 4)) * 0.1

    def loss(W):
        out = jax.vmap(lambda f, k, m: sparse_conv(f, k, W, m))(
            feats, kmaps, masks
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(W)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_impl_variants_agree():
    """All three sparse_conv schedules compute identical results."""
    import numpy as np

    from mvreg.ops.sparse_conv import sparse_conv

    rng = np.random.default_rng(0)
    V, K, Cin, Cout = 257, 27, 24, 40
    feats = jnp.asarray(rng.normal(size=(V, Cin)), jnp.float32)
    kmap = jnp.asarray(
        rng.integers(-1, V, size=(K, V)), jnp.int32
    )
    W = jnp.asarray(rng.normal(size=(K, Cin, Cout)) * 0.1, jnp.float32)
    mask = jnp.asarray(rng.random(V) < 0.9)
    ref = sparse_conv(feats, kmap, W, mask, impl="fused")
    for impl in ("taps", "einsum", "pallas", "pallas2"):
        out = sparse_conv(feats, kmap, W, mask, impl=impl)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
        )


def test_pallas_gather_conv_vmap_and_dense_oracle():
    """The fused-gather Pallas schedule matches the dense-conv oracle and
    batches correctly under vmap (interpret mode on CPU)."""
    key = jax.random.PRNGKey(7)
    grid = _random_sparse_grid(key)
    V = grid.keys.shape[0]
    Cin, Cout, ks = 4, 6, 3
    feats = jax.random.normal(jax.random.PRNGKey(8), (V, Cin))
    feats = feats * grid.mask[:, None]
    kmap = vx.kernel_map(grid.keys, grid.mask, vx.neighbor_offsets(ks))
    W = jax.random.normal(jax.random.PRNGKey(9), (ks**3, Cin, Cout)) * 0.1

    out = sparse_conv(feats, kmap, W, grid.mask, impl="pallas")
    out_ref = dense_conv_reference(
        grid.coords, grid.mask, feats, W.reshape(ks, ks, ks, Cin, Cout), ks,
        (16, 16, 16),
    )
    np.testing.assert_allclose(
        np.asarray(out[grid.mask]), np.asarray(out_ref[grid.mask]), atol=1e-4
    )

    batched = jax.vmap(
        lambda f, k, m: sparse_conv(f, k, W, m, impl="pallas")
    )(
        jnp.stack([feats, feats * 2]),
        jnp.stack([kmap, kmap]),
        jnp.stack([grid.mask, grid.mask]),
    )
    np.testing.assert_allclose(
        np.asarray(batched[0]), np.asarray(out), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(batched[1]), np.asarray(out) * 2, atol=1e-5
    )
