import os

import numpy as np

from mvreg.data.scannet import (
    list_scenes,
    load_scene,
    read_trajectory_log,
    write_synthetic_scene_dir,
)
from mvreg.data.threedmatch import read_overlap_list


def test_scene_roundtrip(tmp_path):
    d = str(tmp_path / "scene0000_00")
    write_synthetic_scene_dir(d, seed=1, num_fragments=4,
                              points_per_fragment=512)
    scene = load_scene(d, points_per_fragment=600)
    assert scene.points.shape == (4, 600, 3)
    assert scene.mask.any(axis=1).all()
    # rigid GT
    RtR = np.einsum("nij,nkj->nik", scene.R_gt, scene.R_gt)
    np.testing.assert_allclose(
        RtR, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5
    )
    # fragment points land where the original synthetic scene put them:
    # transforming local->world with GT poses reassembles overlap regions
    w0 = scene.points[0][scene.mask[0]] @ scene.R_gt[0].T + scene.t_gt[0]
    w1 = scene.points[1][scene.mask[1]] @ scene.R_gt[1].T + scene.t_gt[1]
    d01 = np.linalg.norm(w0[:, None] - w1[None, :300], axis=-1)
    assert (d01.min(axis=1) < 0.05).mean() > 0.1


def test_list_scenes(tmp_path):
    for name in ("sceneB", "sceneA"):
        write_synthetic_scene_dir(
            str(tmp_path / name), seed=2, num_fragments=2,
            points_per_fragment=128,
        )
    scenes = list_scenes(str(tmp_path))
    assert [os.path.basename(s) for s in scenes] == ["sceneA", "sceneB"]


def test_trajectory_log(tmp_path):
    path = str(tmp_path / "poses.log")
    Ts = [np.eye(4), np.diag([1.0, -1, -1, 1])]
    with open(path, "w") as f:
        for k, T in enumerate(Ts):
            f.write(f"{k} {k} {len(Ts)}\n")
            for row in T:
                f.write(" ".join(str(v) for v in row) + "\n")
    out = read_trajectory_log(path)
    np.testing.assert_allclose(out[0], Ts[0])
    np.testing.assert_allclose(out[1], Ts[1])


def test_overlap_list(tmp_path):
    path = str(tmp_path / "overlap.txt")
    with open(path, "w") as f:
        f.write("frag_000.npz frag_001.npz 0.55\n")
        f.write("frag_000.npz frag_002.npz 0.10\n")
        f.write("frag_001.npz frag_002.npz 0.31\n")
    pairs = read_overlap_list(path, min_overlap=0.3)
    assert len(pairs) == 2
    assert pairs[0].overlap == 0.55
