import numpy as np
import pytest

from mvreg.data import native_io
from mvreg.data.threedmatch import read_ply as np_read_ply, write_ply


@pytest.fixture(scope="module")
def have_native():
    if not native_io.native_available():
        pytest.skip("native library not built")
    return True


def test_native_ply_matches_numpy(tmp_path, have_native):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    path = str(tmp_path / "frag.ply")
    write_ply(path, pts, binary=True)
    native = native_io.read_ply(path)
    ref = np_read_ply(path)
    np.testing.assert_array_equal(native, ref)
    np.testing.assert_array_equal(native, pts)


def test_native_ply_ascii(tmp_path, have_native):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    path = str(tmp_path / "frag_ascii.ply")
    write_ply(path, pts, binary=False)
    native = native_io.read_ply(path)
    np.testing.assert_allclose(native, pts, atol=1e-5)


def test_native_voxel_subsample_matches_numpy(have_native):
    rng = np.random.default_rng(2)
    pts = rng.uniform(-2, 2, size=(20000, 3)).astype(np.float32)
    vs = 0.1
    native = native_io.voxel_subsample(pts, vs)
    # numpy oracle: first occurrence per voxel, original order
    coords = np.floor(pts / vs).astype(np.int64)
    _, idx = np.unique(coords, axis=0, return_index=True)
    ref = pts[np.sort(idx)]
    assert len(native) == len(ref)
    np.testing.assert_array_equal(native, ref)


def test_native_voxel_subsample_negative_coords(have_native):
    # exact-integer negative coordinates exercise floor semantics
    pts = np.array(
        [[-1.0, -1.0, -1.0], [-0.99, -0.99, -0.99], [-1.01, -1.01, -1.01]],
        np.float32,
    )
    out = native_io.voxel_subsample(pts, 1.0)
    # floor(-1.0) = -1 => first two share voxel (-1,-1,-1); third is (-2,..)
    assert len(out) == 2


def test_native_random_subsample(have_native):
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    out = native_io.random_subsample(pts, 100, seed=7)
    assert out.shape == (100, 3)
    # all rows come from the input, no duplicates
    pool = {tuple(p) for p in pts.tolist()}
    rows = [tuple(p) for p in out.tolist()]
    assert all(r in pool for r in rows)
    assert len(set(rows)) == 100
    # deterministic
    out2 = native_io.random_subsample(pts, 100, seed=7)
    np.testing.assert_array_equal(out, out2)
    # copy path when n <= target
    small = native_io.random_subsample(pts[:50], 100)
    np.testing.assert_array_equal(small, pts[:50])


def test_fragment_loader_threaded(tmp_path):
    """Native pthread loader returns every fragment once, padded and
    masked, matching the synchronous path's content."""
    from mvreg.data.native_io import (
        FragmentLoader,
        native_available,
        read_ply,
    )
    from mvreg.data.threedmatch import write_ply

    rng = np.random.default_rng(0)
    paths = []
    sizes = [700, 1500, 300, 1000]
    for k, n in enumerate(sizes):
        pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        p = str(tmp_path / f"frag_{k}.ply")
        write_ply(p, pts, binary=(k % 2 == 0))
        paths.append(p)

    P = 1024
    loader = FragmentLoader(paths, points_per_fragment=P, threads=3)
    got = {}
    for idx, pts, mask in loader:
        assert pts.shape == (P, 3) and mask.shape == (P,)
        assert np.all(pts[~mask] == 0)
        got[idx] = (pts.copy(), int(mask.sum()))
    loader.close()
    assert sorted(got) == [0, 1, 2, 3]
    for k, n in enumerate(sizes):
        assert got[k][1] == min(n, P)
        # the valid points must all come from the source file
        src = read_ply(paths[k])
        sel = got[k][0][: got[k][1]]
        d = np.abs(sel[:, None, :] - src[None, :, :]).sum(-1).min(1)
        assert float(d.max()) < 1e-5

    if native_available():
        # second pass, single-threaded: same fragment content
        l2 = FragmentLoader(paths, points_per_fragment=P, threads=1)
        got2 = {i: (p, int(m.sum())) for i, p, m in l2}
        l2.close()
        for k in got:
            assert got[k][1] == got2[k][1]


def test_fragment_loader_voxel_subsample(tmp_path):
    from mvreg.data.native_io import FragmentLoader
    from mvreg.data.threedmatch import write_ply

    rng = np.random.default_rng(1)
    # many duplicate-ish points in few voxels
    base = rng.uniform(0, 0.3, size=(8, 3)).astype(np.float32)
    pts = np.repeat(base, 200, axis=0) + 0.001 * rng.normal(
        size=(1600, 3)
    ).astype(np.float32)
    p = str(tmp_path / "dense.ply")
    write_ply(p, pts.astype(np.float32))
    loader = FragmentLoader([p], points_per_fragment=512, voxel_size=0.1)
    idx, out, mask = next(iter(loader))
    loader.close()
    assert mask.sum() <= 32  # few voxels -> few survivors
    assert mask.sum() >= 4
