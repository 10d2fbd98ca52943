import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops import voxel as vx


def _np_voxelize(points, mask, voxel_size):
    """NumPy oracle for unique-voxel extraction."""
    pts = points[mask]
    origin = pts.min(0) - 0.5 * voxel_size
    coords = np.floor((pts - origin) / voxel_size).astype(np.int64)
    keys = coords[:, 0] * (1 << 20) + coords[:, 1] * (1 << 10) + coords[:, 2]
    uniq = np.unique(keys)
    return origin, coords, uniq


def test_pack_unpack_roundtrip():
    key = jax.random.PRNGKey(0)
    coords = jax.random.randint(key, (1000, 3), 0, 1024, dtype=jnp.int32)
    packed = vx.pack_coords(coords)
    np.testing.assert_array_equal(vx.unpack_coords(packed), coords)
    # injectivity on distinct coords
    u_coords = np.unique(np.asarray(coords), axis=0)
    u_keys = np.unique(np.asarray(packed))
    assert len(u_keys) == len(u_coords)


def test_voxelize_matches_numpy_unique():
    key = jax.random.PRNGKey(1)
    points = jax.random.uniform(key, (2000, 3), minval=0, maxval=3.0)
    mask = jnp.ones(2000, bool).at[1500:].set(False)
    grid = vx.voxelize(points, mask, voxel_size=0.05, capacity=2048)
    _, _, uniq = _np_voxelize(np.asarray(points), np.asarray(mask), 0.05)
    assert int(grid.num_voxels) == len(uniq)
    got = np.sort(np.asarray(grid.keys[grid.mask]))
    np.testing.assert_array_equal(got, uniq)


def test_voxelize_point2voxel_consistent():
    key = jax.random.PRNGKey(2)
    points = jax.random.uniform(key, (500, 3), minval=0, maxval=1.0)
    mask = jnp.ones(500, bool)
    grid = vx.voxelize(points, mask, voxel_size=0.1, capacity=512)
    # every valid point's voxel must contain it
    coords = jnp.floor((points - grid.origin) / 0.1).astype(jnp.int32)
    vox_coords = grid.coords[grid.point2voxel]
    ok = np.asarray(grid.point_mask)
    np.testing.assert_array_equal(
        np.asarray(coords)[ok], np.asarray(vox_coords)[ok]
    )
    assert ok.all()  # capacity was sufficient -> nothing dropped


def test_voxelize_capacity_overflow():
    key = jax.random.PRNGKey(3)
    points = jax.random.uniform(key, (1000, 3), minval=0, maxval=5.0)
    mask = jnp.ones(1000, bool)
    grid = vx.voxelize(points, mask, voxel_size=0.01, capacity=64)
    # ~1000 distinct voxels, capacity 64: exactly 64 kept, mask exact
    assert int(grid.mask.sum()) == 64
    assert int(grid.num_voxels) == 64
    # dropped points are masked out, kept points map into capacity
    assert int(grid.point2voxel.max()) < 64
    kept = np.asarray(grid.point_mask)
    assert 0 < kept.sum() < 1000


def test_voxelize_jit_static_shapes():
    f = jax.jit(lambda p, m: vx.voxelize(p, m, 0.05, 256))
    p = jax.random.uniform(jax.random.PRNGKey(4), (300, 3))
    g1 = f(p, jnp.ones(300, bool))
    g2 = f(p * 0.5, jnp.ones(300, bool))
    assert g1.keys.shape == g2.keys.shape == (256,)


def test_average_pool_points():
    points = jnp.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02],
                        [0.5, 0.5, 0.5]])
    mask = jnp.ones(3, bool)
    grid = vx.voxelize(points, mask, voxel_size=0.1, capacity=8)
    feats = jnp.array([[1.0], [3.0], [10.0]])
    pooled = vx.average_pool_points(grid, feats)
    vals = np.sort(np.asarray(pooled[grid.mask]).ravel())
    np.testing.assert_allclose(vals, [2.0, 10.0])  # mean(1,3) and 10


def test_lookup_hits_and_misses():
    keys = jnp.sort(jnp.array([5, 17, 42, 99, vx.SENTINEL], jnp.int32))
    q = jnp.array([17, 6, 99, vx.SENTINEL], jnp.int32)
    out = vx.lookup(keys, q)
    np.testing.assert_array_equal(np.asarray(out), [1, -1, 3, -1])


def test_kernel_map_small_grid():
    # 2x2x2 block of occupied voxels at coords (0..1)^3
    coords = jnp.array(
        [[x, y, z] for x in range(2) for y in range(2) for z in range(2)],
        jnp.int32,
    )
    keys = jnp.sort(vx.pack_coords(coords))
    mask = jnp.ones(8, bool)
    offsets = vx.neighbor_offsets(3)
    kmap = vx.kernel_map(keys, mask, offsets)
    assert kmap.shape == (27, 8)
    # each voxel has exactly 8 neighbors present (the block itself)
    present = (np.asarray(kmap) >= 0).sum(axis=0)
    np.testing.assert_array_equal(present, np.full(8, 8))
    # identity offset maps each voxel to itself
    center = 13  # offset (0,0,0) in dx-major order
    np.testing.assert_array_equal(np.asarray(kmap[center]), np.arange(8))


def test_coarsen():
    # fine voxels at (0,0,0),(1,1,1) share parent (0,0,0); (2,0,0) -> (1,0,0)
    coords = jnp.array([[0, 0, 0], [1, 1, 1], [2, 0, 0]], jnp.int32)
    keys = jnp.sort(vx.pack_coords(coords))
    grid = vx.VoxelGrid(
        keys=jnp.concatenate([keys, jnp.full((5,), vx.SENTINEL, jnp.int32)]),
        coords=jnp.zeros((8, 3), jnp.int32),
        mask=jnp.arange(8) < 3,
        point2voxel=jnp.zeros(3, jnp.int32),
        point_mask=jnp.ones(3, bool),
        origin=jnp.zeros(3),
        voxel_size=jnp.asarray(0.05),
        num_voxels=jnp.asarray(3, jnp.int32),
    )
    coarse, pool = vx.coarsen(grid, capacity=4)
    assert int(coarse.num_voxels) == 2
    c_coords = np.asarray(coarse.coords[coarse.mask])
    np.testing.assert_array_equal(
        np.sort(c_coords, axis=0), [[0, 0, 0], [1, 0, 0]]
    )
    # parents of the two fine voxels in parent (0,0,0) agree
    p = np.asarray(pool.parent[:3])
    fine_coords = np.asarray(vx.unpack_coords(keys))
    for a in range(3):
        for b in range(3):
            same_parent = (fine_coords[a] // 2 == fine_coords[b] // 2).all()
            assert (p[a] == p[b]) == same_parent


def test_voxelize_empty_input():
    points = jnp.zeros((10, 3))
    grid = vx.voxelize(points, jnp.zeros(10, bool), 0.05, 16)
    assert int(grid.num_voxels) == 0
    assert not bool(grid.mask.any())
    assert not bool(grid.point_mask.any())
    assert np.isfinite(np.asarray(grid.origin)).all()


def test_kernel_map_sym_matches_kernel_map():
    """The symmetric builder (half sort-joins + scatter inverses) must
    reproduce kernel_map exactly, including padded/masked slots."""
    for seed, ks in ((0, 3), (1, 3), (2, 5)):
        key = jax.random.PRNGKey(seed)
        pts = jax.random.uniform(key, (500, 3), minval=0.0, maxval=1.0)
        pm = jax.random.uniform(jax.random.PRNGKey(seed + 9), (500,)) < 0.9
        g = vx.voxelize(pts, pm, 0.08, 256)
        offs = vx.neighbor_offsets(ks)
        ref = vx.kernel_map(g.keys, g.mask, offs)
        sym = vx.kernel_map_sym(g.keys, g.mask, offs)
        np.testing.assert_array_equal(np.asarray(sym), np.asarray(ref))
