"""High-level user API: point clouds in, globally consistent poses out.

The reference exposes its capabilities only through scripts
(`ref:scripts/benchmark_*_registration.py`, demo — SURVEY.md L6); a user
switching to this framework gets a library-level entry point instead.
`Registrar` wraps the full pipeline (descriptors → matching → filtering →
robust Procrustes → confidence → IRLS synchronization) behind two calls:

    reg = Registrar.from_checkpoint("runs/x")   # or Registrar() untrained
    result = reg.register([cloud0, cloud1, ...])  # ragged numpy clouds
    result.R, result.t       # absolute poses, fragment-local -> global
    reg.register_pair(a, b)  # pairwise T_ab only

Ragged inputs are padded host-side to the configured static shapes; jit
compiles one executable per (num_fragments, num_points) shape bucket.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from mvreg.config.schema import PipelineConfig, resolve_config
from mvreg.pipeline import (
    RegistrationParams,
    init_params,
    register_pair as _register_pair,
    register_scene as _register_scene,
    extract_descriptors,
)

Array = jax.Array


class SceneRegistration(NamedTuple):
    """Absolute poses (fragment-local frame -> global frame) + edge data."""

    R: np.ndarray  # (N, 3, 3)
    t: np.ndarray  # (N, 3)
    edge_index: np.ndarray  # (E, 2) fragment index pairs
    edge_R: np.ndarray  # (E, 3, 3) pairwise estimates
    edge_t: np.ndarray  # (E, 3)
    edge_confidence: np.ndarray  # (E,)
    edge_weight: np.ndarray  # (E,) final IRLS sync weights


class PairRegistration(NamedTuple):
    R: np.ndarray  # (3, 3), maps cloud_a points into cloud_b's frame
    t: np.ndarray  # (3,)
    confidence: float
    num_correspondences: int


def _pad_clouds(
    clouds: Sequence[np.ndarray], num_points: int | None
) -> tuple[np.ndarray, np.ndarray]:
    n = max(len(c) for c in clouds)
    P = num_points or int(2 ** int(np.ceil(np.log2(max(n, 1)))))
    if n > P:
        raise ValueError(
            f"cloud with {n} points exceeds capacity {P}; pass num_points"
        )
    pts = np.zeros((len(clouds), P, 3), np.float32)
    msk = np.zeros((len(clouds), P), bool)
    for i, c in enumerate(clouds):
        c = np.asarray(c, np.float32)
        if c.ndim != 2 or c.shape[1] != 3:
            raise ValueError(f"cloud {i} must be (n, 3), got {c.shape}")
        pts[i, : len(c)] = c
        msk[i, : len(c)] = True
    return pts, msk


class Registrar:
    """Multiview registration engine bound to a config + parameter set."""

    def __init__(
        self,
        cfg: PipelineConfig | None = None,
        params: RegistrationParams | None = None,
        use_filter: bool | None = None,
    ):
        from mvreg.utils.compile_cache import enable_compile_cache

        enable_compile_cache()
        self.cfg = cfg or PipelineConfig()
        self.params = params or init_params(
            jax.random.PRNGKey(0), self.cfg
        )
        # Untrained filtering weights hurt; default to the robust
        # IRLS/RANSAC path unless the caller loaded a checkpoint.
        self.use_filter = (params is not None) if use_filter is None \
            else use_filter
        # One jitted callable per entry point; jax.jit itself caches one
        # executable per input-shape bucket.
        self._scene_jit = None
        self._pair_jit = None

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_dir: str,
        cfg: PipelineConfig | None = None,
        use_filter: bool = True,
    ) -> "Registrar":
        """Restore params (+ the checkpoint's saved config) from orbax."""
        import os
        import warnings

        from mvreg.train.checkpoints import CheckpointManager
        from mvreg.train.loop import registration_params
        from mvreg.train.state import create_train_state

        if cfg is None and not os.path.exists(
            os.path.join(ckpt_dir, "config.yaml")
        ):
            warnings.warn(
                f"{ckpt_dir} has no config.yaml (checkpoint predates "
                "config-carrying); falling back to default config. If the "
                "model was trained with non-default voxel/model settings "
                "the restored descriptors will be silently wrong — pass "
                "cfg= explicitly.",
                stacklevel=2,
            )
        cfg = cfg or resolve_config(None, ckpt_dir, ())
        state = create_train_state(jax.random.PRNGKey(0), cfg)
        state = CheckpointManager(ckpt_dir).restore(state)
        return cls(cfg, registration_params(state), use_filter=use_filter)

    def _scene_fn(self):
        if self._scene_jit is None:
            self._scene_jit = jax.jit(
                lambda p, x, m: _register_scene(
                    p, self.cfg, x, m, use_filter=self.use_filter
                )
            )
        return self._scene_jit

    def register(
        self,
        clouds: Sequence[np.ndarray],
        num_points: int | None = None,
    ) -> SceneRegistration:
        """Register N fragment clouds into one global frame.

        clouds: sequence of (n_i, 3) arrays in their local frames.
        Returns absolute poses with the gauge fixed to fragment 0
        (R[0] = I, t[0] = 0).
        """
        if len(clouds) < 2:
            raise ValueError("need at least 2 fragments")
        pts, msk = _pad_clouds(clouds, num_points)
        out = self._scene_fn()(
            self.params, jnp.asarray(pts), jnp.asarray(msk)
        )
        R = np.asarray(out.sync.R)
        t = np.asarray(out.sync.t)
        # Gauge fix T'_n = T_0⁻¹ ∘ T_n: sync's world frame is arbitrary,
        # the user-facing one anchors fragment 0 at the identity.
        R0, t0 = R[0], t[0]
        R = np.ascontiguousarray(np.einsum("ij,nik->njk", R0, R))  # R0ᵀ·Rn
        t = (t - t0) @ R0  # R0ᵀ (t_n - t_0)
        return SceneRegistration(
            R=R,
            t=t,
            edge_index=np.asarray(out.edge_idx),
            edge_R=np.asarray(out.pairs.R),
            edge_t=np.asarray(out.pairs.t),
            edge_confidence=np.asarray(out.pairs.confidence),
            edge_weight=np.asarray(out.sync.weights),
        )

    def register_pair(
        self,
        cloud_a: np.ndarray,
        cloud_b: np.ndarray,
        num_points: int | None = None,
    ) -> PairRegistration:
        """Estimate the rigid transform mapping cloud_a into cloud_b."""
        pts, msk = _pad_clouds([cloud_a, cloud_b], num_points)
        if self._pair_jit is None:
            def fn(p, x, m):
                d = extract_descriptors(p, self.cfg, x, m)
                da = jax.tree_util.tree_map(lambda a: a[0], d)
                db = jax.tree_util.tree_map(lambda a: a[1], d)
                return _register_pair(
                    p, self.cfg, da, db, use_filter=self.use_filter
                )
            self._pair_jit = jax.jit(fn)
        out = self._pair_jit(
            self.params, jnp.asarray(pts), jnp.asarray(msk)
        )
        return PairRegistration(
            R=np.asarray(out.R),
            t=np.asarray(out.t),
            confidence=float(out.confidence),
            num_correspondences=int(np.asarray(out.corr_mask).sum()),
        )
