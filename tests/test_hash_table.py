import jax
import jax.numpy as jnp
import numpy as np

from mvreg.ops import voxel as vx
from mvreg.ops.hash_table import build, kernel_map_hashed, lookup


def _random_keys(key, n, cap):
    coords = jax.random.randint(key, (n, 3), 0, 64, dtype=jnp.int32)
    keys = jnp.unique(vx.pack_coords(coords), size=cap,
                      fill_value=vx.SENTINEL)
    mask = keys != vx.SENTINEL
    return keys, mask


def test_build_and_lookup_all_present():
    keys, mask = _random_keys(jax.random.PRNGKey(0), 2000, 1024)
    table, placed = build(keys, mask)
    assert bool(placed.all()), f"{int((~placed).sum())} keys unplaced"
    idx = lookup(table, keys)
    valid = np.asarray(mask)
    np.testing.assert_array_equal(
        np.asarray(idx)[valid], np.arange(1024)[valid]
    )


def test_lookup_misses():
    keys, mask = _random_keys(jax.random.PRNGKey(1), 500, 512)
    table, _ = build(keys, mask)
    # query keys not in the table
    probe = vx.pack_coords(
        jax.random.randint(jax.random.PRNGKey(2), (256, 3), 100, 200,
                           dtype=jnp.int32)
    )
    out = lookup(table, probe)
    present = set(np.asarray(keys[mask]).tolist())
    for q, o in zip(np.asarray(probe).tolist(), np.asarray(out).tolist()):
        if q not in present:
            assert o == -1
    # SENTINEL query always misses
    assert int(lookup(table, jnp.array([vx.SENTINEL]))[0]) == -1


def test_kernel_map_hashed_matches_searchsorted():
    pts = jax.random.uniform(jax.random.PRNGKey(3), (800, 3), minval=0.0,
                             maxval=1.2)
    grid = vx.voxelize(pts, jnp.ones(800, bool), 0.05, 512)
    offsets = vx.neighbor_offsets(3)
    ref = vx.kernel_map(grid.keys, grid.mask, offsets)
    got = kernel_map_hashed(grid.keys, grid.mask, offsets)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_jit_and_vmap():
    f = jax.jit(lambda k, m: kernel_map_hashed(k, m,
                                               vx.neighbor_offsets(3)))
    pts = jax.random.uniform(jax.random.PRNGKey(4), (2, 500, 3))
    grids = jax.vmap(lambda p: vx.voxelize(p, jnp.ones(500, bool), 0.05, 512))(
        pts
    )
    out = jax.vmap(f)(grids.keys, grids.mask)
    ref = jax.vmap(
        lambda k, m: vx.kernel_map(k, m, vx.neighbor_offsets(3))
    )(grids.keys, grids.mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
