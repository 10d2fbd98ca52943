"""End-to-end registration pipeline: descriptors → match → filter →
Procrustes → confidence → synchronization.

This is the framework's equivalent of the reference's top-level flows
(`ref:scripts/benchmark_pairwise_registration.py` §3.2 and
`ref:scripts/benchmark_multiview_registration.py` §3.3 in SURVEY.md),
re-designed as pure jittable functions: a whole scene — all fragments'
descriptors, all C(N,2) pairwise registrations, and the IRLS sync — runs
as ONE compiled program on device, where the reference loops pairs in
Python, caches features to disk, and hops to host CPU for sync.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mvreg.config.schema import PipelineConfig
from mvreg.core.metrics import transformation_residuals
from mvreg.core.transforms import relative as tf_relative
from mvreg.core.procrustes import irls_kabsch, kabsch
from mvreg.models.fcgf import (
    FCGF,
    build_unet_plan,
    plan_lookup,
    resolve_conv_impl,
)
from mvreg.models.filtering import ConfidenceNet, FilteringNet, edge_statistics
from mvreg.ops.knn import mutual_match, nn_match, soft_match
from mvreg.sync.irls import SyncResult, synchronize

Array = jax.Array


class RegistrationParams(NamedTuple):
    """All model variables (each a dict with 'params' [+ 'batch_stats'])."""

    fcgf: dict
    filter: dict
    confidence: dict


class Descriptors(NamedTuple):
    feats: Array  # (B, V, D) unit descriptors
    centers: Array  # (B, V, 3) voxel centers, fragment-local frame
    mask: Array  # (B, V)
    # surface normals + planarity per voxel (ops/normals.py), computed
    # when any point-to-plane stage is enabled; None otherwise (None is
    # an empty pytree, so tree_map call sites need no changes)
    normals: Array | None = None
    nweights: Array | None = None


class PairResult(NamedTuple):
    R: Array  # (3, 3) estimated T_ij rotation (frame i -> frame j)
    t: Array  # (3,)
    confidence: Array  # () edge confidence in [0, 1]
    logits: Array  # (K,) filtering logits
    weights: Array  # (K,) filtering weights
    x: Array  # (K, 3) source keypoints (frame i)
    y: Array  # (K, 3) matched targets (frame j)
    corr_mask: Array  # (K,)
    overlap: Array  # () symmetric cloud-overlap score of (R, t) in [0,1]


class SceneResult(NamedTuple):
    edge_idx: Array  # (E, 2)
    pairs: PairResult  # batched over E
    sync: SyncResult  # absolute poses


def make_models(cfg: PipelineConfig):
    if cfg.model.family == "pointnet":
        from mvreg.models.pointnet import PointNetDescriptor

        fcgf = PointNetDescriptor(
            channels=cfg.model.channels[:3],
            out_dim=cfg.model.descriptor_dim,
            k_neighbors=cfg.model.pointnet_k,
            patch_radius=cfg.model.pointnet_radius,
        )
    else:
        fcgf = FCGF(
            channels=cfg.model.channels, out_dim=cfg.model.descriptor_dim,
            compute_dtype=cfg.model.compute_dtype, remat=cfg.model.remat,
            conv_impl=resolve_conv_impl(cfg.model, cfg.voxel),
            dense_grid=cfg.voxel.dense_grid,
            kernel_taps=cfg.model.kernel_taps,
        )
    fnet = FilteringNet(
        channels=cfg.filter.channels,
        num_clusters=cfg.filter.num_clusters,
        blocks_before=cfg.filter.blocks_before,
        blocks_cluster=cfg.filter.blocks_cluster,
        blocks_after=cfg.filter.blocks_after,
    )
    cnet = ConfidenceNet()
    return fcgf, fnet, cnet


def init_params(key: Array, cfg: PipelineConfig) -> RegistrationParams:
    """Initialize all model variables on dummy static-shaped inputs."""
    fcgf, fnet, cnet = make_models(cfg)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    P = 512
    pts = jax.random.uniform(k4, (1, P, 3), minval=0.0, maxval=1.0)
    if cfg.model.family == "pointnet":
        centers = jax.random.uniform(k4, (1, cfg.voxel.capacities[0], 3))
        fcgf_vars = fcgf.init(
            k1, centers, jnp.ones((1, cfg.voxel.capacities[0])), train=False
        )
    else:
        plan = build_unet_plan(
            pts, jnp.ones((1, P), bool), cfg.voxel.voxel_size,
            cfg.voxel.capacities, cfg.voxel.kernel_size,
            plan_lookup(cfg.model, cfg.voxel),
            taps=cfg.model.kernel_taps,
        )
        feats = jnp.ones((1, cfg.voxel.capacities[0], 1))
        fcgf_vars = fcgf.init(k1, plan, feats, train=False)
    corr = jnp.zeros((1, cfg.match.num_corr, 6))
    fvars = fnet.init(k2, corr, jnp.ones((1, cfg.match.num_corr)), train=False)
    cvars = cnet.init(k3, jnp.zeros((1, 8)))
    return RegistrationParams(fcgf=fcgf_vars, filter=fvars, confidence=cvars)


def extract_descriptors(
    params: RegistrationParams,
    cfg: PipelineConfig,
    points: Array,
    mask: Array,
    train: bool = False,
) -> Descriptors:
    """Descriptors for a batch of fragments (B, P, 3) -> (B, V, D).

    Dispatches on cfg.model.family: the FCGF sparse UNet (needs the full
    coordinate plan) or the PointNet patch descriptor (voxelize only)."""
    fcgf, _, _ = make_models(cfg)
    if cfg.model.family == "pointnet":
        from mvreg.ops import voxel as vx

        grids = jax.vmap(
            lambda p, m: vx.voxelize(
                p, m, cfg.voxel.voxel_size, cfg.voxel.capacities[0]
            )
        )(points, mask)
        centers = grids.origin[:, None, :] + (
            grids.coords.astype(points.dtype) + 0.5
        ) * grids.voxel_size[:, None, None]
        centers = centers * grids.mask[..., None]
        desc = fcgf.apply(params.fcgf, centers, grids.mask, train=False)
        return Descriptors(feats=desc, centers=centers, mask=grids.mask)
    plan = build_unet_plan(
        points, mask, cfg.voxel.voxel_size, cfg.voxel.capacities,
        cfg.voxel.kernel_size, plan_lookup(cfg.model, cfg.voxel),
        taps=cfg.model.kernel_taps,
    )
    feats = input_features(plan)
    desc = fcgf.apply(params.fcgf, plan, feats, train=False)
    centers = voxel_positions(cfg, plan, points)
    normals = nweights = None
    if cfg.match.icp_plane_iters > 0 or cfg.sync.scene_icp_plane_rounds > 0:
        lk = plan_lookup(cfg.model, cfg.voxel)
        if lk not in ("dense", "brick") and len(cfg.voxel.capacities) > 1:
            # L1-level normals reuse the plan's L1 kernel map — ~8x
            # cheaper than the L0 neighbor gather (r4_bench_k19
            # regression: the L0 version cost more than sparse kernel
            # taps saved).
            from mvreg.ops.normals import voxel_normals_l1

            cap1 = int(cfg.voxel.capacities[1])
            normals, nweights = jax.vmap(
                lambda g, p, pool, km: voxel_normals_l1(
                    g, p, pool, km, cap1
                )
            )(plan.grids[0], points, plan.pools[0], plan.kmaps[1])
        else:
            from mvreg.ops.normals import voxel_normals

            normals, nweights = jax.vmap(voxel_normals)(
                plan.grids[0], points
            )
    return Descriptors(
        feats=desc, centers=centers, mask=plan.masks[0],
        normals=normals, nweights=nweights,
    )


def voxel_positions(cfg: PipelineConfig, plan, points: Array) -> Array:
    """World-space correspondence position per level-0 voxel (B, V, 3).

    voxel.subvoxel_centers: the centroid of the actual points in each
    voxel (rigid-transform-equivariant, sub-voxel accurate) — otherwise
    the grid-quantized voxel center (MinkowskiEngine-style).
    """
    from mvreg.ops import voxel as vx

    g = plan.grids[0]
    if cfg.voxel.subvoxel_centers:
        cent = jax.vmap(vx.average_pool_points)(g, points)
        return cent * plan.masks[0][..., None]
    centers = g.origin[:, None, :] + (
        g.coords.astype(points.dtype) + 0.5
    ) * g.voxel_size[:, None, None]
    return centers * plan.masks[0][..., None]


def input_features(plan) -> Array:
    """Per-voxel input features: log1p point density (masked).

    The reference feeds all-ones (geometry enters via the sparse
    structure); local density is additional transform-invariant signal
    that costs nothing (FCGF-compatible channel count).
    """
    from mvreg.ops import voxel as vx

    counts = jax.vmap(vx.voxel_point_counts)(plan.grids[0])
    return (jnp.log1p(counts) * plan.masks[0])[..., None]


def select_keypoints(
    desc: Array, centers: Array, mask: Array, num: int, key: Array | None = None
) -> tuple[Array, Array, Array]:
    """Pick `num` keypoint rows, valid-first, spatially unbiased, static.

    Voxel rows arrive sorted by packed coordinate (x-major); taking the
    first `num` valid rows would select a single spatial slab of the
    fragment and can miss the overlap region entirely. Valid rows are
    therefore ordered by a hash of their row index — a deterministic
    uniform-spread subsample (optionally randomized with `key`).
    """
    V = mask.shape[0]
    idx = jnp.arange(V, dtype=jnp.uint32)
    h = idx * jnp.uint32(0x9E3779B9)
    h = h ^ (h >> 16)
    tie = (h & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65536.0
    if key is not None:
        tie = jax.random.uniform(key, (V,))
    score = (~mask.astype(bool)).astype(jnp.float32) * 2.0 + tie
    order = jnp.argsort(score)[:num]
    return desc[order], centers[order], mask[order].astype(bool)


def register_pair(
    params: RegistrationParams,
    cfg: PipelineConfig,
    desc_i: Descriptors,
    desc_j: Descriptors,
    train: bool = False,
    use_soft_match: bool = False,
    use_filter: bool = True,
) -> PairResult:
    """Estimate T_ij (mapping fragment-i points into fragment j's frame).

    Mirrors the reference inner loop (SURVEY.md §3.2): NN match in
    descriptor space → filtering net → robust weighted Procrustes →
    confidence. `use_filter=False` skips the learned filter (uniform
    weights over the putative set) — the IRLS Procrustes alone then plays
    the role the reference delegates to RANSAC.
    """
    _, fnet, cnet = make_models(cfg)
    K = cfg.match.num_corr
    kd, kc, km = desc_i.feats, desc_i.centers, desc_i.mask
    fd, fc, fm = select_keypoints(kd, kc, km, K)

    backend = cfg.match.backend
    if backend == "auto":
        # XLA everywhere (round 5): the Pallas match kernels fault the
        # axon TPU worker in long multi-dispatch programs — both the
        # two-pass and the fused variant died at the second scene of
        # the eval battery (r5_recall8_v9k7.log); every stable eval in
        # rounds 2-4 had backend: xla pinned via checkpoint config.
        # Explicit backend="pallas" remains the A/B opt-in.
        backend = "xla"

    if use_soft_match:
        if backend == "pallas":
            from mvreg.ops.pallas.soft_match import soft_match_pallas

            y = soft_match_pallas(
                fd, fm, desc_j.feats, desc_j.mask, desc_j.centers,
                cfg.match.soft_temperature,
                interpret=jax.default_backend() == "cpu",
            )
        else:
            y = soft_match(
                fd, fm, desc_j.feats, desc_j.mask, desc_j.centers,
                cfg.match.soft_temperature,
            )
        corr_mask = fm
    elif cfg.match.mutual:
        if backend == "pallas":
            from mvreg.ops.pallas.match_argmin import (
                mutual_match_pallas,
                mutual_match_pallas_fused,
            )

            mm = (
                mutual_match_pallas_fused
                if cfg.match.pallas_fused else mutual_match_pallas
            )
            # interpret on CPU (tests/virtual mesh); compiled on TPU.
            idx, _, mut = mm(
                fd, fm, desc_j.feats, desc_j.mask,
                interpret=jax.default_backend() == "cpu",
                precision=cfg.match.pallas_precision,
            )
        else:
            idx, _, mut = mutual_match(fd, fm, desc_j.feats, desc_j.mask)
        y = desc_j.centers[idx]
        corr_mask = fm & mut
    else:
        if backend == "pallas":
            from mvreg.ops.pallas.match_argmin import nn_match_pallas

            idx, _ = nn_match_pallas(
                fd, fm, desc_j.feats, desc_j.mask,
                interpret=jax.default_backend() == "cpu",
                precision=cfg.match.pallas_precision,
            )
        else:
            idx, _ = nn_match(fd, fm, desc_j.feats, desc_j.mask)
        y = desc_j.centers[idx]
        corr_mask = fm

    x = fc * corr_mask[:, None]
    y = y * corr_mask[:, None]
    corr = jnp.concatenate([x, y], axis=-1)
    if use_filter:
        logits, w = fnet.apply(
            params.filter, corr[None], corr_mask[None].astype(corr.dtype),
            train=False,
        )
        logits, w = logits[0], w[0]
    else:
        logits = jnp.where(corr_mask, 1e3, -1e3)
        w = corr_mask.astype(corr.dtype)
    w_eff = w * corr_mask + 1e-3 * corr_mask
    if cfg.match.estimator == "ransac":
        from mvreg.core.ransac import ransac_kabsch

        # High-breakdown alternative (vectorized hypothesis batch); the
        # learned weights gate which correspondences may be sampled.
        gate = corr_mask & (w > 0.3) if use_filter else corr_mask
        gate = jnp.where(jnp.sum(gate) >= 8, gate, corr_mask)
        rr = ransac_kabsch(
            x, y, gate, jax.random.PRNGKey(0),
            num_hypotheses=cfg.match.ransac_hypotheses,
            sample_size=cfg.match.ransac_sample_size,
            inlier_threshold=cfg.match.ransac_threshold,
            refine_iters=cfg.match.ransac_refine_iters,
        )
        R, t = rr.R, rr.t
    else:
        R, t, _ = irls_kabsch(
            x, y, w_eff, num_iters=cfg.match.irls_iters,
            scale=cfg.match.irls_scale,
        )

    def _polish(Rc, tc):
        if cfg.match.icp_iters <= 0:
            return Rc, tc
        from mvreg.ops.icp import icp_refine

        # Polish on the raw keypoint geometry (all valid keypoints, not
        # just descriptor matches); junk pairs keep their pose.
        return icp_refine(
            Rc, tc, fc, fm, desc_j.centers, desc_j.mask,
            num_iters=cfg.match.icp_iters,
            scale=cfg.match.icp_scale,
            trust_radius=cfg.match.icp_trust_radius,
            min_inliers=cfg.match.icp_min_inliers,
        )

    def _plane_polish(Rc, tc):
        # Point-to-plane refinement of the SELECTED pose only — running
        # it on every candidate tripled the plane cost for no selection
        # benefit (candidates are ranked on the p2p-polished poses, as
        # in round 3; r4_bench_k27_cheap 49.3 vs 57.0 fr/s plane-off).
        if cfg.match.icp_plane_iters <= 0 or desc_j.normals is None:
            return Rc, tc
        from mvreg.ops.icp import icp_refine

        return icp_refine(
            Rc, tc, fc, fm, desc_j.centers, desc_j.mask,
            num_iters=0,
            scale=cfg.match.icp_scale,
            trust_radius=cfg.match.icp_trust_radius,
            min_inliers=cfg.match.icp_min_inliers,
            y_normals=desc_j.normals,
            y_nweight=desc_j.nweights,
            plane_iters=cfg.match.icp_plane_iters,
        )

    if cfg.match.spectral:
        # Multi-hypothesis + overlap verification. Structured outliers
        # (self-similar scenes) can hand EITHER weighting an aliased
        # rigid-consistent pose; neither dominates the other (measured:
        # filter-IRLS 39% vs spectral 21% good edges on the hard scene,
        # but the sets differ). Solve with both, then keep the pose
        # whose transform actually overlaps the clouds (aliased
        # solutions misalign everything off the repeated structure).
        from mvreg.ops.spectral_match import spectral_filter_weights
        from mvreg.ops.pose_verify import select_best_pose

        w_spec = spectral_filter_weights(
            x, y, corr_mask,
            sigma=cfg.match.spectral_sigma,
            num_iters=12,
            keep_quantile=cfg.match.spectral_quantile,
        )
        R_s, t_s, _ = irls_kabsch(
            x, y, w_spec * (0.2 + 0.8 * w_eff),
            num_iters=cfg.match.irls_iters, scale=cfg.match.irls_scale,
        )
        # Strided verification tables: voxel rows are key-sorted
        # (x-major spatial order), so a stride is a uniform spatial
        # subsample for free. Hypothesis scoring uses the coarse
        # stride; final selection the denser one (schema: MatchConfig
        # verify_stride_*; measured on chip the full-table hypothesis
        # scorer dominated the whole edge program, r3_chainprof.json).
        sh = max(cfg.match.verify_stride_hyp, 1)
        sf = max(cfg.match.verify_stride_final, 1)
        yc_f, ym_f = desc_j.centers[::sf], desc_j.mask[::sf]
        cand_R = [_polish(R, t), _polish(R_s, t_s)]
        if cfg.match.overlap_ransac_hypotheses > 0:
            from mvreg.ops.pose_verify import ransac_overlap_candidate

            # verification subset: first Kv spread keypoints
            Kv = min(256, fc.shape[0])
            R_o, t_o = ransac_overlap_candidate(
                jax.random.PRNGKey(0), x, y, corr_mask,
                fc[:Kv], fm[:Kv], desc_j.centers[::sh], desc_j.mask[::sh],
                num_hypotheses=cfg.match.overlap_ransac_hypotheses,
                tau=cfg.match.verify_tau,
            )
            cand_R.append(_polish(R_o, t_o))
        R, t, _scores = select_best_pose(
            jnp.stack([c[0] for c in cand_R]),
            jnp.stack([c[1] for c in cand_R]),
            fc, fm, yc_f, ym_f,
            tau=cfg.match.verify_tau,
        )
        ov = jnp.max(_scores)
        R, t = _plane_polish(R, t)
    else:
        from mvreg.ops.pose_verify import overlap_score

        sf = max(cfg.match.verify_stride_final, 1)
        R, t = _plane_polish(*_polish(R, t))
        ov = overlap_score(
            R, t, fc, fm, desc_j.centers[::sf], desc_j.mask[::sf],
            tau=cfg.match.verify_tau,
        )
    res = transformation_residuals(R, t, x, y)
    stats = edge_statistics(w, corr_mask.astype(w.dtype), res)
    conf = cnet.apply(params.confidence, stats[None])[0]
    return PairResult(
        R=R, t=t, confidence=conf, logits=logits, weights=w,
        x=x, y=y, corr_mask=corr_mask, overlap=ov,
    )


def all_pairs(n: int) -> Array:
    """Static (E, 2) upper-triangle edge list, E = C(n, 2)."""
    return jnp.array(
        [(i, j) for i in range(n) for j in range(i + 1, n)], dtype=jnp.int32
    )


def register_edges(
    params: RegistrationParams,
    cfg: PipelineConfig,
    desc: Descriptors,
    edge_idx: Array,
    use_filter: bool = True,
) -> PairResult:
    """Pairwise registration of a batch of edges (E, 2) -> PairResult[E].

    Chunked vmap: batches the per-edge matching/filtering GEMMs into
    MXU-sized contractions without materializing all E distance blocks.
    Split out of register_scene so eval harnesses can run edge chunks as
    small reusable programs (one monolithic 435-edge program's compile
    blew the round-1 mv30 eval timeout) and so the distributed path can
    shard the edge axis.
    """

    def one_edge(e):
        di = jax.tree_util.tree_map(lambda a: a[e[0]], desc)
        dj = jax.tree_util.tree_map(lambda a: a[e[1]], desc)
        return register_pair(params, cfg, di, dj, use_filter=use_filter)

    E = edge_idx.shape[0]
    return jax.lax.map(
        one_edge, edge_idx, batch_size=min(cfg.match.edge_batch, E)
    )


def overlap_gate(cfg: PipelineConfig, overlap: Array) -> Array:
    """Monotone ramp of the cloud-overlap verifier score into [0, 1].

    Soft (not a hard prune): correct poses on genuinely low-overlap
    pairs score ~the true overlap fraction, so relative ordering — not
    a global threshold — is what the spectral sync needs.
    """
    g = jnp.maximum(overlap - cfg.sync.overlap_floor, 0.0) / (
        1.0 - cfg.sync.overlap_floor
    )
    return g ** cfg.sync.overlap_power


def initial_edge_weights(cfg: PipelineConfig, pairs: PairResult) -> Array:
    """Sync-input edge weights: confidence, threshold-pruned (fallback
    to raw confidences if pruning empties the graph), then gated by the
    cloud-overlap verifier score."""
    c_init = pairs.confidence * (
        pairs.confidence >= cfg.sync.confidence_threshold
    )
    c_init = jnp.where(jnp.sum(c_init) > 1e-6, c_init, pairs.confidence)
    if cfg.sync.overlap_gate:
        gated = c_init * overlap_gate(cfg, pairs.overlap)
        # never hand the eigensolver an all-zero graph
        c_init = jnp.where(jnp.sum(gated) > 1e-6, gated, c_init)
    # Connectivity floor (round 5, default off): mix a small fraction
    # of the RAW confidence back under the pruned/gated weights. The
    # threshold prune can disconnect the sync graph outright (an
    # over-conservative confidence head zeroes most true edges), and
    # no solver bridges an empty cut — the eigensolver then mixes the
    # components' gauges arbitrarily (the v8k19d mv30 collapse,
    # r5_syncprobe_v8k19d.json: oracle 1.16 deg, real weights 88 deg).
    # Flooring at frac*confidence preserves relative ordering while
    # guaranteeing the graph stays as connected as the raw-confidence
    # graph; on the saved v8k19d edge data frac=0.01 takes IRLS from
    # 88 deg / 1.8 m to 0.54 deg / 1.9 cm. Default 0.0 pending a full
    # eval battery (it changes every shipped number class).
    if cfg.sync.weight_floor_frac > 0.0:
        c_init = jnp.maximum(
            c_init, cfg.sync.weight_floor_frac * pairs.confidence
        )
    # Degenerate-mass guard: an (untrained / all-junk) confidence head
    # can emit ~1e-9 weights on every edge — numerically a DISCONNECTED
    # graph, which NaN'd the sharded sync solves (r4 dryrun bisect). No
    # information -> uniform prior over edges.
    c_init = jnp.where(
        jnp.sum(c_init) > 1e-3, c_init, jnp.ones_like(c_init)
    )
    return c_init


def sync_with_refine(
    cfg: PipelineConfig,
    edge_idx: Array,
    pairs: PairResult,
    n_nodes: int,
    desc: Descriptors | None = None,
) -> tuple[PairResult, SyncResult]:
    """Confidence-pruned IRLS sync + pairwise<->sync refinement (C7+C8).

    Per refine iteration (SURVEY.md C8, paper §3.3): re-weight each
    edge's correspondences by their residual under the *synced* relative
    pose, re-solve Procrustes, re-synchronize. Fixed iteration count
    keeps it one static program.
    """
    c_init = initial_edge_weights(cfg, pairs)
    # (triplet tables assume the all_pairs upper-triangle edge layout;
    # skip the gate for pruned/custom edge lists)
    all_pairs_layout = (
        edge_idx.shape[0] == n_nodes * (n_nodes - 1) // 2
    )
    if cfg.sync.cycle_gate and n_nodes >= 3 and all_pairs_layout:
        from mvreg.sync.cycles import cycle_consistency_scores

        # Alias edges survive both the confidence net and the overlap
        # gate (they genuinely align repeated structure); composition
        # cycles are what they cannot fake. Neutral without evidence;
        # never hand the eigensolver an all-zero graph.
        cyc = cycle_consistency_scores(
            pairs.R, pairs.t, c_init, n_nodes,
            tau_rot_deg=cfg.sync.cycle_tau_rot,
            tau_trans=cfg.sync.cycle_tau_trans,
        )
        gated = c_init * cyc ** cfg.sync.cycle_power
        c_init = jnp.where(jnp.sum(gated) > 1e-6, gated, c_init)
    sync = synchronize(
        edge_idx, pairs.R, pairs.t, c_init, n_nodes=n_nodes,
        num_iters=cfg.sync.num_iters, cauchy_b=cfg.sync.cauchy_b,
        trans_scale=cfg.sync.trans_scale,
        cauchy_b_trans=cfg.sync.cauchy_b_trans,
    )
    for _ in range(cfg.sync.refine_iters):
        i, j = edge_idx[:, 0], edge_idx[:, 1]
        R_se, t_se = tf_relative(
            sync.R[i], sync.t[i], sync.R[j], sync.t[j]
        )
        res_sync = transformation_residuals(R_se, t_se, pairs.x, pairs.y)
        w_ref = (
            (pairs.weights + 1e-3)
            * pairs.corr_mask
            / (1.0 + (res_sync / cfg.match.irls_scale) ** 2)
        )
        R2, t2, _ = jax.vmap(
            lambda xx, yy, ww: irls_kabsch(
                xx, yy, ww, cfg.match.irls_iters, cfg.match.irls_scale
            )
        )(pairs.x, pairs.y, w_ref)
        pairs = pairs._replace(R=R2, t=t2)
        sync = synchronize(
            edge_idx, pairs.R, pairs.t, jnp.maximum(sync.weights, 1e-3 * c_init),
            n_nodes=n_nodes, num_iters=cfg.sync.num_iters,
            cauchy_b=cfg.sync.cauchy_b, trans_scale=cfg.sync.trans_scale,
            cauchy_b_trans=cfg.sync.cauchy_b_trans,
        )
    if cfg.sync.pose_gn_iters > 0:
        from mvreg.sync.pose_gn import pose_graph_gn

        # Joint GN over all verified correspondences: long/mid-range
        # edges act as loop closures, correcting the collective warp.
        # Edge gate: the final IRLS weights alone. (An overlap-gated
        # floor was tried and hurt — lattice-slid alias edges score
        # HIGH on cloud overlap by construction, so the floor re-admits
        # exactly the poison; r3_mv30_v4_gnc.json vs r3_mv30_v4_gn.json.)
        w_edge = sync.weights
        sync = pose_graph_gn(
            edge_idx, pairs.x, pairs.y,
            (pairs.weights + 1e-3) * pairs.corr_mask,
            w_edge, sync,
            num_iters=cfg.sync.pose_gn_iters,
            scale=cfg.sync.pose_gn_scale,
            scale_start=cfg.sync.pose_gn_scale_start,
            damping=cfg.sync.pose_gn_damping,
        )
    # Plane-only polish (scene_icp_rounds=0, scene_icp_plane_rounds>0) is
    # a legal config: the plane rounds must not be silently gated behind
    # the point-to-point rounds (ADVICE r4) — extract_descriptors already
    # paid for the normals it needs.
    if desc is not None and (
        cfg.sync.scene_icp_rounds > 0
        or (cfg.sync.scene_icp_plane_rounds > 0 and desc.normals is not None)
    ):
        from mvreg.sync.refine import scene_icp_refine

        sync = scene_icp_refine(
            desc.centers, desc.mask, sync,
            rounds=cfg.sync.scene_icp_rounds,
            icp_iters=cfg.match.icp_iters if cfg.match.icp_iters > 0 else 3,
            scale=cfg.match.icp_scale,
            trust_radius=cfg.match.icp_trust_radius,
            normals=desc.normals,
            nweights=desc.nweights,
            plane_rounds=(
                cfg.sync.scene_icp_plane_rounds
                if desc.normals is not None else 0
            ),
            min_inliers=cfg.match.icp_min_inliers,
        )
    return pairs, sync


def register_scene(
    params: RegistrationParams,
    cfg: PipelineConfig,
    points: Array,
    mask: Array,
    use_filter: bool = True,
) -> SceneResult:
    """Full multiview registration of one scene (N, P, 3) -> absolute poses.

    One jittable program: descriptors for all fragments, vmapped pairwise
    registration over all C(N,2) edges, confidence-pruned IRLS sync
    (SURVEY.md §3.3, C8). Eval harnesses with big scenes should prefer
    running the stages (extract_descriptors / register_edges /
    sync_with_refine) as separate programs to bound compile time.
    """
    N = points.shape[0]
    desc = extract_descriptors(params, cfg, points, mask)
    edge_idx = all_pairs(N)
    pairs = register_edges(params, cfg, desc, edge_idx, use_filter=use_filter)
    pairs, sync = sync_with_refine(cfg, edge_idx, pairs, n_nodes=N, desc=desc)
    return SceneResult(edge_idx=edge_idx, pairs=pairs, sync=sync)
