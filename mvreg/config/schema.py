"""Typed configuration system with YAML overlay.

Counterpart of `ref:lib/config.py::get_config` + `ref:configs/*.yaml`
(SURVEY.md C16, L7) — the reference merges YAML dicts into a dot-access
config; here configs are frozen dataclasses (typo-proof, jit-hashable
where needed) with YAML load/save and dotted-path overrides.

Every reference hyperparameter is surfaced: voxel size (2.5 cm), voxel
capacities, correspondence count, filtering channels/clusters, inlier
threshold τ, sync iterations, Cauchy b, confidence prune threshold
(SURVEY.md §5.6).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass(frozen=True)
class VoxelConfig:
    voxel_size: float = 0.025  # meters (reference: 2.5 cm)
    capacities: tuple[int, ...] = (8192, 4096, 2048, 1024)
    kernel_size: int = 3
    lookup: str = "sortjoin"  # kernel-map backend: sortjoin|searchsorted|hash
    # Static grid extent for model.conv_impl="dense" (voxels per axis;
    # each must be divisible by 2^(levels-1)). Voxels outside are dropped.
    dense_grid: tuple[int, int, int] = (96, 96, 96)
    # Correspondence positions: per-voxel point centroid (sub-voxel
    # accuracy) instead of the quantized voxel center. Pure eval-time
    # geometry — no parameters involved — so existing checkpoints
    # benefit without retraining. Grid-center quantization alone puts a
    # ~voxel/√12-per-axis noise floor under every Kabsch solve (~1.4°
    # at 5 cm voxels on 1 m-scale fragments).
    subvoxel_centers: bool = True


@dataclass(frozen=True)
class ModelConfig:
    family: str = "fcgf"  # descriptor family: "fcgf" | "pointnet"
    channels: tuple[int, ...] = (32, 64, 128, 256)
    descriptor_dim: int = 32
    compute_dtype: str = "float32"  # "bfloat16" for the fast MXU path
    remat: bool = False  # rematerialize UNet blocks in training
    # sparse_conv schedule: fused|taps|einsum|dense|auto ("auto" picks
    # dense on accelerators with small grids, else fused — see
    # models/fcgf.py::resolve_conv_impl for the measured rule)
    # fused|taps|einsum|dense|brick|pallas|pallas2|auto — "brick" is the
    # block-sparse schedule (ops/brick.py): dense 4^3 bricks + halo
    # windows, ~7x fewer gathered rows and 28x smaller plan sort-joins.
    conv_impl: str = "fused"
    # Kernel support per UNet level: 27 (full 3³, the reference's
    # MinkowskiEngine kernel), 19 (corners dropped), or 7 (face cross).
    # The sparse conv is gather-ROW-bound on TPU (~8 ns/row,
    # r3_chainprof), so cost scales ~linearly with taps — 7-tap at L0
    # is a ~3.9x lever on the UNet's dominant level. Checkpoints carry
    # their value via config.yaml; weight shapes differ across values
    # (scripts/slice_taps.py converts 27-tap checkpoints).
    kernel_taps: tuple[int, int, int, int] = (27, 27, 27, 27)
    pointnet_k: int = 32
    pointnet_radius: float = 0.3


@dataclass(frozen=True)
class MatchConfig:
    num_corr: int = 1024  # putative correspondences per pair
    mutual: bool = True
    # NN-match backend. "auto" resolves to the chunked-XLA path on every
    # platform since round 5: the Pallas streaming kernel wins standalone
    # (1.27x XLA at bit-exact HIGHEST precision, 5.1x at bf16;
    # runs/results/r3_match_sweep2.json) but faults the axon TPU worker
    # in ANY long multi-dispatch program — the round-3/4 bench fault,
    # and in round 5 BOTH kernel variants (two-pass and fused) died at
    # the second scene of the 8-scene eval battery
    # (r5_recall8_v9k7.log / r5_queue1.log). Every stable flagship eval
    # in rounds 2-4 had carried backend: xla via its checkpoint
    # config.yaml. "pallas" stays as the explicit opt-in for A/Bs and
    # for toolchains where the worker fault is fixed.
    backend: str = "auto"  # "auto" | "xla" | "pallas"
    # MXU precision of the Pallas match kernel: "highest" is bit-exact
    # vs the XLA path (1.27x faster); "default" truncates to bf16 (5.1x
    # faster, ~0.7% argmin flips on near-tie descriptors) — ship only
    # with an end-to-end accuracy A/B (r3 weak #3).
    pallas_precision: str = "highest"
    # Fused bidirectional mutual match: one Gram sweep feeds both match
    # directions (half the MXU work and half the kernel count of the
    # two-pass version; round-4 VERDICT item 7's program-context change).
    # Default OFF: its first shipping exposure faulted the axon TPU
    # worker mid-eval (r5_recall8_v9k7.log: scene_0 clean, then
    # INVALID_ARGUMENT — the two-pass kernel has been stable on eval
    # paths for two rounds). Opt-in for A/B until the chip probe
    # (scripts/match_fused_probe.py) proves it stable.
    pallas_fused: bool = False
    soft_temperature: float = 0.02
    irls_iters: int = 3  # robust Procrustes reweighting (RANSAC stand-in)
    irls_scale: float = 0.05  # Cauchy scale, meters
    estimator: str = "irls"  # robust solver at eval: "irls" | "ransac"
    # Spectral geometric-consistency inlier scoring (ops/spectral_match):
    # principal eigenvector of the rigid-distance-preservation
    # compatibility matrix gates the Procrustes weights. Rescues the
    # 5-20% inlier regime where filter+IRLS collapses (50 deg -> 0.2 deg
    # at 5% inliers in the unit A/B).
    spectral: bool = True
    spectral_sigma: float = 0.05  # distance-consistency scale, meters
    spectral_quantile: float = 0.9  # zero scores below this quantile
    # Overlap-verification NN threshold for multi-hypothesis pose
    # selection (ops/pose_verify.py), meters.
    verify_tau: float = 0.1
    # Overlap-scored RANSAC hypothesis source (0 = off): minimal samples
    # scored by cloud overlap instead of match consensus — the escape
    # hatch from structured outlier cliques that fool both the learned
    # filter and spectral consistency.
    overlap_ransac_hypotheses: int = 512
    # Stride-subsample of the TARGET voxel table when scoring the H
    # overlap-RANSAC hypotheses (voxel rows are key-sorted = spatially
    # x-major, so a stride is a uniform spatial subsample at zero
    # cost). The full-table scoring materialized (H, Kv, V) f32
    # distance blocks — ~34 GB of HBM traffic per 8-pair step, the
    # single largest post-descriptor cost on chip (r3_chainprof.json:
    # the full edge stack at 126.6 ms vs ~11 ms for all its parts
    # without the H-hypothesis scorer). Hypothesis RANKING only needs
    # coarse overlap estimates — winners are ICP-polished and
    # re-scored on the denser final table before selection.
    verify_stride_hyp: int = 8  # 8192-row table -> 1024 scoring rows
    # Stride for the FINAL candidate-selection / edge-overlap score
    # (select_best_pose, overlap_score): milder, since PairResult.
    # overlap feeds the sync gate. 4 -> 2048 rows.
    verify_stride_final: int = 4
    # Point-to-point ICP polish of every pose candidate (ops/icp.py):
    # 0 = off. Each iteration is one (K, V) distance matmul + weighted
    # Kabsch; junk pairs keep their original pose via the inlier gate.
    # Default on: with the verified multi-hypothesis solve the initial
    # pose is usually in the true basin, where polish takes pairwise
    # translation from ~dm to ~cm.
    icp_iters: int = 3
    icp_scale: float = 0.05  # Cauchy scale, meters
    icp_trust_radius: float = 0.25  # max NN association distance, meters
    # Junk-pair safety: ICP stages (p2p and plane) revert to their input
    # pose when the final within-trust-radius association count is below
    # this. 0 disables the revert — used by the sharded-parity smoke
    # test, where the revert's step discontinuity at junk (untrained)
    # match quality flips between bitwise-different replicas; trained-
    # scale parity WITH the gate is covered by r5_sharded_scene.json.
    icp_min_inliers: int = 16
    # Point-to-PLANE Gauss-Newton iterations appended to the pairwise
    # ICP polish (ops/icp.py). Matched voxels from offset grids cover
    # different surface patches, so point-to-point floors at ~voxel/2
    # tangential centroid mismatch (the measured 2-3 cm translation
    # noise floor, VERDICT r3); the plane residual measures only the
    # normal component. Needs per-voxel normals (ops/normals.py),
    # computed once per fragment in extract_descriptors. Applied to the
    # SELECTED pose only (candidates rank on p2p-polished poses). The
    # winner-iteration sweep at the v8k19 flagship: 2 -> 2.45° mean /
    # rot@3° 0.556; 3 -> 1.63° / 0.706 (best); 4 -> 2.29° / 0.579
    # (r4_mv30_{flagship,pi3,pi4}.json).
    icp_plane_iters: int = 3
    # Edges vmapped per lax.map chunk in register_scene: bigger chunks =
    # larger batched GEMMs (MXU utilization) at higher peak memory.
    edge_batch: int = 16
    ransac_hypotheses: int = 512
    ransac_sample_size: int = 3
    ransac_threshold: float = 0.075  # meters
    ransac_refine_iters: int = 2


@dataclass(frozen=True)
class FilterConfig:
    channels: int = 128
    num_clusters: int = 500
    blocks_before: int = 3
    blocks_cluster: int = 3
    blocks_after: int = 3
    inlier_threshold: float = 0.075  # meters (τ for BCE labels, C9)


@dataclass(frozen=True)
class SyncConfig:
    num_iters: int = 4
    cauchy_b: float = 0.5
    # Tighter Cauchy scale (meters / trans_scale) for the translation
    # solve's own robust weights (sync/irls.py second translation pass):
    # correct-rotation / lattice-slid alias edges keep moderate weight
    # under the combined residual and poison only the translation LS.
    # THE tuned parameter of the round-2 translation fix.
    cauchy_b_trans: float = 0.15
    confidence_threshold: float = 0.3  # prune edges below
    # Cloud-overlap gate on the sync init weights: the verifier score
    # (PairResult.overlap) separates correct from aliased/junk poses
    # with AUROC 1.0 on the hard synthetic scene (runs/results/
    # r2_scene8_diag_ovl.json: good >= 0.65, bad <= 0.59) where the
    # learned confidence saturates at 0.99 on both.
    overlap_gate: bool = True
    # Floor re-tuned for the soft hinge proximity score (pose_verify):
    # aligned poses land ~0.4-0.9, aliased/junk ~0.05-0.25. COUPLING
    # (ADVICE r3): the score is computed against a stride-subsampled
    # target table, so its absolute scale depends on
    # match.verify_stride_final — this floor is calibrated at stride 4;
    # re-check it if the stride changes (coarser stride -> lower
    # scores -> effectively stricter floor).
    overlap_floor: float = 0.15  # scores at/below this gate to zero
    # Connectivity floor: initial sync weights are floored at
    # frac * raw confidence so the threshold prune can never disconnect
    # the graph (pipeline.initial_edge_weights). 0 = off (round-5
    # default; measured rescue of a split-gauge collapse at 0.01 —
    # RESULTS round-5 bonus section).
    weight_floor_frac: float = 0.0
    overlap_power: float = 2.0  # sharpness of the ramp above the floor
    # Triplet cycle-consistency gate on the sync init weights
    # (sync/cycles.py): lattice-slid alias edges pass the overlap gate
    # and saturate the confidence net by construction, but leave a
    # ~lattice-period residual in every composition cycle through them.
    # Neutral (score 1) for edges without reliable triplet evidence.
    cycle_gate: bool = True
    cycle_tau_rot: float = 10.0  # deg — cycle closure gate
    cycle_tau_trans: float = 0.25  # meters
    cycle_power: float = 2.0  # sharpness of the score -> weight ramp
    # Extra scene-ICP rounds with point-to-plane residuals after the
    # point-to-point rounds (sync/refine.py; same noise-floor argument
    # as match.icp_plane_iters — this is the stage that sets the final
    # absolute-translation accuracy). One round: the full sweep at the
    # v8k19 flagship (winner plane iters x scene rounds,
    # r4_mv30_{flagship,pi3,pi4,v8k19_pl2,combo}.json) reads
    # iters3/rounds1 = 1.63° mean, rot@3° 0.706, trans@5cm 0.605 —
    # best overall; a second scene round buys ~3 mm translation but
    # costs ~0.5° rotation (over-iteration on single-cell normals).
    scene_icp_plane_rounds: int = 1
    # Global pose-graph Gauss-Newton over the verified correspondences
    # (sync/pose_gn.py): one joint damped-GN solve over all N node poses
    # — loop-closure constraints per-edge sync and per-node scene-ICP
    # cannot see. Default OFF: the round-3 A/B at the v7 checkpoint
    # shows the IRLS+refine+scene-ICP stack alone is better once the
    # correspondences are good (mv30 trans@75cm 99.5% off vs 88.7% on;
    # mv8 mean rot 3.26 vs 4.22 deg — GN optimizes into the 2-3 cm
    # descriptor-match noise floor; r3_mv{8,30}_v7_nogn.json). Turn on
    # (4-8 iters) for graphs with large collective drift and weak
    # local refinement.
    pose_gn_iters: int = 0
    pose_gn_scale: float = 0.05  # final Cauchy scale on ||r||, meters
    # Graduated non-convexity: anneal the Cauchy scale geometrically
    # from pose_gn_scale_start down to pose_gn_scale. Default equal
    # (constant scale): the annealed variant measured WORSE at 30
    # fragments (41.8% vs 44.6% trans@75cm, r3_mv30_v4_gnc.json) — the
    # wide early basin lets collectively-slid alias translations pull.
    pose_gn_scale_start: float = 0.05
    pose_gn_damping: float = 1e-3  # Levenberg factor (relative)
    # Scene-level Jacobi ICP polish of the synced ABSOLUTE poses
    # (sync/refine.py): fixes the translation drift that survives the
    # graph solve. 0 = off.
    scene_icp_rounds: int = 2
    trans_scale: float = 1.0
    # pairwise<->sync refinement rounds (C8). 2 is the measured winner of
    # the on-chip sweep (runs/results/mv_sweep_*.json: rot@5deg 0.607 and
    # median 4.2deg at (cauchy_b=0.5, refine_iters=2) vs 0.393/6.2 at 1).
    refine_iters: int = 2


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    lr_decay: float = 0.99  # exponential, per epoch-equivalent
    weight_decay: float = 0.0
    batch_pairs: int = 4
    steps: int = 10000
    seed: int = 0
    checkpoint_every: int = 500
    bf16: bool = True  # bfloat16 feature path, fp32 solves
    # Synthetic-pair curriculum: crop-center shift range (m) and the
    # fraction of zero-overlap negative pairs (filter/confidence
    # calibration for junk edges — see data/batching.py).
    shift_min: float = 0.5
    shift_max: float = 0.5
    negative_fraction: float = 0.0
    # Synthetic world generation for TRAINING streams ("v1"|"v2"; eval
    # benchmarks stay v1 for cross-round comparability — see
    # data/synthetic.sample_world_surface).
    world_richness: str = "v1"
    # Sync stage: backprop into the descriptor through differentiable
    # soft-argmax matching (the reference trains end-to-end through SVD
    # and eigh — SURVEY.md §0; hard NN matching blocks those gradients).
    sync_train_descriptor: bool = False
    # Final-update scale for the descriptor subtree (per-group lr that
    # keeps the opt_state pytree unchanged): the e2e sync stage needs
    # the descriptor 10-100x slower than the sync head or it collapses
    # (round-2 v5; VERDICT item 6).
    descriptor_lr_scale: float = 1.0


@dataclass(frozen=True)
class PipelineConfig:
    voxel: VoxelConfig = field(default_factory=VoxelConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    match: MatchConfig = field(default_factory=MatchConfig)
    filter: FilterConfig = field(default_factory=FilterConfig)
    sync: SyncConfig = field(default_factory=SyncConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def _to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {
            f.name: _to_dict(getattr(cfg, f.name))
            for f in dataclasses.fields(cfg)
        }
    if isinstance(cfg, tuple):
        return list(cfg)
    return cfg


def _from_dict(cls: type, d: dict) -> Any:
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if dataclasses.is_dataclass(f.type if isinstance(f.type, type) else None):
            kwargs[f.name] = _from_dict(f.type, v)
        elif f.name in _NESTED.get(cls, {}):
            kwargs[f.name] = _from_dict(_NESTED[cls][f.name], v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


_NESTED = {
    PipelineConfig: {
        "voxel": VoxelConfig,
        "model": ModelConfig,
        "match": MatchConfig,
        "filter": FilterConfig,
        "sync": SyncConfig,
        "train": TrainConfig,
    }
}


def save_yaml(cfg: PipelineConfig, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(_to_dict(cfg), f, sort_keys=False)


def load_yaml(path: str) -> PipelineConfig:
    with open(path) as f:
        return _from_dict(PipelineConfig, yaml.safe_load(f) or {})


def resolve_config(
    config_path: str | None = None,
    ckpt_dir: str | None = None,
    sets: list[str] | tuple[str, ...] = (),
) -> PipelineConfig:
    """CLI config resolution: explicit YAML > checkpoint's saved config >
    defaults, then dotted `--set key=value` overrides.

    `scripts/train.py` writes its resolved config to
    `<ckpt_dir>/config.yaml`; eval/diagnostic CLIs restoring from that
    checkpoint pick it up automatically, so the train-time voxel/model
    settings no longer have to be repeated by hand (a silent-quality-
    collapse hazard: a restored descriptor evaluated under different
    voxel settings produces garbage without erroring).
    """
    import logging
    import os

    saved = os.path.join(ckpt_dir, "config.yaml") if ckpt_dir else None
    if config_path:
        cfg = load_yaml(config_path)
    elif saved and os.path.exists(saved):
        cfg = load_yaml(saved)
        logging.getLogger(__name__).info("config from checkpoint: %s", saved)
    else:
        cfg = PipelineConfig()
    overrides = {}
    for kv in sets:
        k, v = kv.split("=", 1)
        try:
            v = eval(v, {}, {})  # numbers / tuples / bools
        except Exception:
            pass
        overrides[k] = v
    return override(cfg, **overrides) if overrides else cfg


def override(cfg: PipelineConfig, **dotted: Any) -> PipelineConfig:
    """Apply dotted-path overrides: override(cfg, **{"sync.num_iters": 8})."""
    d = _to_dict(cfg)
    for key, val in dotted.items():
        node = d
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"unknown config key: {key}")
        node[parts[-1]] = val
    return _from_dict(PipelineConfig, d)
