"""mvreg — TPU-native multiview 3D point-cloud registration.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference `zgojcic/3D_multiview_reg` (CVPR 2020): sparse voxel descriptor
extraction (FCGF-style), learned correspondence filtering, differentiable
weighted-Procrustes pairwise pose estimation, per-edge confidence, and
IRLS spectral transformation synchronization — designed TPU-first
(static shapes + masks, MXU-shaped GEMMs, pjit/Mesh sharding, Pallas
kernels on the hot paths), not a port.

Layout (see SURVEY.md §7):
  core/      SE(3) math, metrics, weighted Procrustes
  ops/       voxel hashing, sparse conv, matching, batched 3x3 SVD, Pallas kernels
  models/    FCGF-style sparse UNet, PointCN/OA filtering net, confidence head
  sync/      IRLS spectral transformation synchronization
  data/      synthetic scenes, 3DMatch/ScanNet readers, padding/bucketing
  train/     losses, train state/step, checkpoints
  eval/      3DMatch pairwise recall + ScanNet multiview ECDF harnesses
  parallel/  device mesh, edge-sharded distributed sync
  config/    typed configs + YAML presets
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level exports: `from mvreg import Registrar` without
    # paying jax/flax import cost for modules that don't need it.
    if name in ("Registrar", "SceneRegistration", "PairRegistration"):
        from mvreg import api

        return getattr(api, name)
    if name == "PipelineConfig":
        from mvreg.config.schema import PipelineConfig

        return PipelineConfig
    raise AttributeError(f"module 'mvreg' has no attribute {name!r}")
