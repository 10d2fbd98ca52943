"""Synthetic multiview scenes for offline testing and benchmarking.

The reference has no synthetic data path (its tests are the benchmarks on
downloaded 3DMatch/ScanNet sets; SURVEY.md §4); with no datasets on disk
in this environment, every integration test and benchmark bootstraps from
here (SURVEY.md §7 build order 6). Scenes mimic indoor TSDF fragments: a
structured world surface (heightfield floor + walls + boxes/spheres) is
sampled, then N partially-overlapping ball crops become fragments, each
expressed in its own local frame with a known GT absolute pose.

Host-side numpy (mirrors the reference's CPU dataloader stage); outputs
are fixed-size padded arrays ready for device upload.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Scene(NamedTuple):
    """A synthetic multiview scene.

    points:  (N, P, 3) float32 — fragment point clouds in LOCAL frames
    mask:    (N, P) bool
    R_gt:    (N, 3, 3) — local -> world rotations
    t_gt:    (N, 3)
    centers: (N, 3) — world-frame crop centers (diagnostics)
    """

    points: np.ndarray
    mask: np.ndarray
    R_gt: np.ndarray
    t_gt: np.ndarray
    centers: np.ndarray


def _random_rotation(rng: np.random.Generator, n: int = 1) -> np.ndarray:
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    ).reshape(n, 3, 3)
    return R


def sample_world_surface(
    rng: np.random.Generator,
    num_points: int = 200_000,
    extent: float = 4.0,
    richness: str = "v1",
) -> np.ndarray:
    """Sample a structured indoor-ish surface: multi-frequency floor
    heightfield, two walls, and scattered boxes/spheres. Deliberately
    geometry-rich — descriptors can only localize on distinctive
    structure, and a bland floor is globally self-similar (the contrastive
    loss then floors out on impossible lookalike negatives).

    richness="v2" (training-stream only; benchmarks stay "v1" for
    cross-round continuity): twice the objects, freely ROTATED boxes,
    cylinders, and tilted plane panels — more distinctive local
    geometry per crop and less axis-aligned self-similarity, targeting
    the 0.05-0.25 putative-inlier-rate bottleneck (VERDICT item 8).

    richness="v3" (training-stream only): v2 plus QUASI-periodic panel
    rows — identical-looking panels at regular spacing, each carrying a
    small per-panel detail (size jitter + a knob at a panel-unique
    offset). Lattice-slid matches between neighboring panels are then
    hard negatives the contrastive loss can actually separate (true
    lookalikes beyond safe_radius but with real distinguishing cues in
    the receptive field) — the alias-scene curriculum (round-4 VERDICT
    item 4: scene_0 pairwise recall stuck at 0.39 on periodic aliasing).
    Returns (num_points, 3) float32."""
    parts = []
    n_floor = num_points // 3
    xy = rng.uniform(0, extent, size=(n_floor, 2))
    freqs = rng.uniform(1.0, 8.0, size=(6, 2))
    phases = rng.uniform(0, 2 * np.pi, size=6)
    amps = rng.uniform(0.03, 0.12, size=6) / np.sqrt(
        np.linalg.norm(freqs, axis=1)
    )
    z = sum(
        a * np.sin(xy @ f + p) for a, f, p in zip(amps, freqs, phases)
    )
    parts.append(np.column_stack([xy, z]))

    n_wall = num_points // 8
    for axis in (0, 1):
        u = rng.uniform(0, extent, size=(n_wall,))
        v = rng.uniform(0, 1.8, size=(n_wall,))
        w = np.full(n_wall, 0.0) + 0.02 * rng.normal(size=n_wall)
        pts = np.zeros((n_wall, 3))
        pts[:, axis] = w
        pts[:, 1 - axis] = u
        pts[:, 2] = v
        parts.append(pts)

    n_obj = num_points - n_floor - 2 * n_wall
    n_kinds = 12 if richness == "v1" else 24
    n_each = max(n_obj // n_kinds, 1)
    for _ in range(n_kinds):
        c = np.array(
            [rng.uniform(0.5, extent - 0.5), rng.uniform(0.5, extent - 0.5),
             rng.uniform(0.2, 0.8)]
        )
        kind = rng.random()
        if richness == "v3" and kind >= 0.75:  # quasi-periodic panel row
            m = int(rng.integers(3, 6))
            spacing = rng.uniform(0.35, 0.8)
            a = rng.uniform(0.25, 0.6, size=2)
            Rrow = _random_rotation(rng)[0]
            step_dir = Rrow[:, 0]
            n_panel = max(n_each // m, 8)
            for pi in range(m):
                # per-panel distinguishing detail: ±4% size jitter and a
                # small knob at a panel-unique in-plane offset
                ap = a * rng.uniform(0.96, 1.04, size=2)
                uv = rng.uniform(-0.5, 0.5, size=(n_panel, 2)) * ap
                p = np.column_stack(
                    [uv, 0.01 * rng.normal(size=n_panel)]
                )
                knob_c = rng.uniform(-0.35, 0.35, size=2) * ap
                knob_r = rng.uniform(0.03, 0.06)
                nk = max(n_panel // 6, 4)
                d = rng.normal(size=(nk, 3))
                d /= np.linalg.norm(d, axis=-1, keepdims=True)
                knob = np.column_stack(
                    [np.tile(knob_c, (nk, 1)), np.zeros(nk)]
                ) + knob_r * d
                p = np.concatenate([p, knob])
                p = p @ Rrow.T + c + pi * spacing * step_dir
                parts.append(p)
            continue
        if kind < 0.5 and richness == "v1" or kind < 0.3:  # sphere shell
            r = rng.uniform(0.08, 0.35)
            d = rng.normal(size=(n_each, 3))
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            parts.append(c + r * d)
        elif richness == "v1" or kind < 0.6:  # box shell
            half = rng.uniform(0.08, 0.35, size=3)
            face = rng.integers(0, 6, size=n_each)
            p = rng.uniform(-1, 1, size=(n_each, 3)) * half
            ax, sign = face % 3, np.where(face < 3, 1.0, -1.0)
            p[np.arange(n_each), ax] = sign * half[ax]
            if richness != "v1":  # freely rotated (breaks axis aliasing)
                p = p @ _random_rotation(rng)[0].T
            parts.append(c + p)
        elif kind < 0.85:  # cylinder shell (v2)
            r = rng.uniform(0.06, 0.25)
            h = rng.uniform(0.2, 0.9)
            th = rng.uniform(0, 2 * np.pi, size=n_each)
            z = rng.uniform(-0.5, 0.5, size=n_each) * h
            p = np.column_stack([r * np.cos(th), r * np.sin(th), z])
            p = p @ _random_rotation(rng)[0].T
            parts.append(c + p)
        else:  # tilted plane panel (v2)
            a = rng.uniform(0.2, 0.7, size=2)
            uv = rng.uniform(-0.5, 0.5, size=(n_each, 2)) * a
            p = np.column_stack([uv, 0.01 * rng.normal(size=n_each)])
            p = p @ _random_rotation(rng)[0].T
            parts.append(c + p)

    pts = np.concatenate(parts)[:num_points].astype(np.float32)
    return pts


def make_scene(
    seed: int,
    num_fragments: int = 6,
    points_per_fragment: int = 4096,
    crop_radius: float = 1.2,
    noise: float = 0.005,
    extent: float = 4.0,
    world_points: int = 150_000,
    min_overlap_shift: float = 0.6,
    rotation_mode: str = "gravity",
    centers_override: np.ndarray | None = None,
    richness: str = "v1",
) -> Scene:
    """Generate a scene of partially-overlapping fragments with GT poses.

    Crop centers form a random walk across the world so consecutive
    fragments overlap (shift < crop diameter); each crop is mapped into a
    random local frame by the *inverse* of its GT pose, with Gaussian
    noise added in the local frame.

    centers_override: (num_fragments, 3) explicit world-frame crop
    centers, replacing the random walk (the walk clips to the world box,
    so it cannot place crops at guaranteed-disjoint separations — callers
    building zero-overlap negatives need explicit placement).
    """
    rng = np.random.default_rng(seed)
    world = sample_world_surface(rng, world_points, extent, richness)

    if centers_override is not None:
        centers = np.asarray(centers_override, float).reshape(
            num_fragments, 3
        )
    else:
        centers = np.zeros((num_fragments, 3))
        c = rng.uniform(1.0, extent - 1.0, size=3) * np.array([1, 1, 0.2])
        for k in range(num_fragments):
            centers[k] = c
            step = rng.normal(size=3) * np.array([1.0, 1.0, 0.1])
            step = step / (np.linalg.norm(step) + 1e-9) * min_overlap_shift
            c = np.clip(
                c + step,
                [0.5, 0.5, -0.5],
                [extent - 0.5, extent - 0.5, 1.0],
            )

    if rotation_mode == "so3":
        R_gt = _random_rotation(rng, num_fragments)
    elif rotation_mode == "gravity":
        # Scan-like poses: free yaw, modest tilt (3DMatch fragments come
        # from a hand-held/gravity-aligned sensor; full random SO(3) makes
        # the descriptor-invariance task much harder than the benchmark).
        R_gt = np.zeros((num_fragments, 3, 3))
        for k in range(num_fragments):
            yaw = rng.uniform(0, 2 * np.pi)
            tilt_axis = rng.normal(size=3)
            tilt_axis[2] = 0.0
            tilt_axis /= np.linalg.norm(tilt_axis) + 1e-9
            tilt = rng.uniform(0, 0.3)
            cz, sz = np.cos(yaw), np.sin(yaw)
            Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1.0]])
            K = np.array([
                [0, -tilt_axis[2], tilt_axis[1]],
                [tilt_axis[2], 0, -tilt_axis[0]],
                [-tilt_axis[1], tilt_axis[0], 0],
            ])
            Rt = np.eye(3) + np.sin(tilt) * K + (1 - np.cos(tilt)) * K @ K
            R_gt[k] = Rt @ Rz
    else:
        raise ValueError(f"unknown rotation_mode {rotation_mode}")
    t_gt = rng.uniform(-2.0, 2.0, size=(num_fragments, 3))

    P = points_per_fragment
    points = np.zeros((num_fragments, P, 3), np.float32)
    mask = np.zeros((num_fragments, P), bool)
    for k in range(num_fragments):
        d2 = ((world - centers[k]) ** 2).sum(-1)
        inside = np.flatnonzero(d2 < crop_radius**2)
        if len(inside) == 0:
            continue
        take = rng.choice(inside, size=min(P, len(inside)), replace=False)
        crop_world = world[take]
        # local = R_gtᵀ (world - t_gt)  so that  world = R_gt local + t_gt
        local = (crop_world - t_gt[k]) @ R_gt[k]
        local += noise * rng.normal(size=local.shape)
        points[k, : len(take)] = local.astype(np.float32)
        mask[k, : len(take)] = True

    return Scene(
        points=points,
        mask=mask,
        R_gt=R_gt.astype(np.float32),
        t_gt=t_gt.astype(np.float32),
        centers=centers.astype(np.float32),
    )


def make_pair(
    seed: int,
    points_per_fragment: int = 4096,
    noise: float = 0.005,
    overlap_shift: float = 0.5,
    rotation_mode: str = "gravity",
    richness: str = "v1",
) -> Scene:
    """Two-fragment scene (the 3DMatch-style pairwise training unit)."""
    return make_scene(
        seed,
        num_fragments=2,
        points_per_fragment=points_per_fragment,
        noise=noise,
        min_overlap_shift=overlap_shift,
        rotation_mode=rotation_mode,
        richness=richness,
    )
