"""Edge-sharded multiview scene registration (inference).

Round-1 distributed only the train step and the sync layer; this module
shards the FULL inference path of one scene over the mesh's `edge` axis
(VERDICT.md round-1 item 8; SURVEY.md §2.4 — the pose-graph analog of
context parallelism):

  1. descriptors: the fragment batch is padded to a multiple of the mesh
     size and sharded over EDGE_AXIS (pjit partitions the vmapped UNet);
  2. pairwise registration: the C(N,2) edge list is padded + sharded;
     each device registers its local edges against the (replicated)
     descriptor set inside a shard_map — the matching/filtering GEMMs
     stay device-local, nothing crosses ICI;
  3. sync + refine: partial Laplacian assembly from local edges, one
     psum per IRLS iteration (dist_sync.sync_body_local), refinement
     re-solves edge-local.

Numerical invariant (tested in tests/test_distributed.py): sharded ==
single-device register_scene to float tolerance.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mvreg.config.schema import PipelineConfig
from mvreg.core.metrics import transformation_residuals
from mvreg.core.procrustes import irls_kabsch
from mvreg.core.transforms import relative as tf_relative
from mvreg.parallel.dist_sync import sync_body_local
from mvreg.parallel.mesh import EDGE_AXIS
from mvreg.pipeline import (
    SceneResult,
    all_pairs,
    extract_descriptors,
    register_edges,
)
from mvreg.sync.irls import SyncResult

Array = jax.Array


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    pad = n - x.shape[0]
    if pad <= 0:
        return x
    return np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])


def register_scene_sharded(
    params,
    cfg: PipelineConfig,
    points: Array,
    mask: Array,
    mesh: Mesh,
    use_filter: bool = True,
) -> SceneResult:
    """Register one scene with fragments + edges sharded over `mesh`.

    points (N, P, 3), mask (N, P) are host/global arrays; returns the
    same SceneResult as pipeline.register_scene (padded edges removed).
    """
    # Since round 5 "auto" resolves to xla on every platform inside
    # register_pair itself (the Pallas match kernels fault the axon
    # worker in long multi-dispatch programs; see MatchConfig.backend).
    # Still pin it here against the MESH platform so an EXPLICIT
    # backend="pallas" on a CPU virtual mesh inside a TPU-default
    # process (the multichip dryrun environment) doesn't dispatch a
    # compiled Pallas kernel onto CPU devices.
    mesh_platform = mesh.devices.flat[0].platform
    if (
        cfg.match.backend == "pallas"
        and mesh_platform != "tpu"
        and jax.default_backend() != "cpu"
    ):
        from mvreg.config.schema import override as _cfg_override

        cfg = _cfg_override(cfg, **{"match.backend": "xla"})

    N = int(points.shape[0])
    D = mesh.shape[EDGE_AXIS]
    edge_idx = np.asarray(all_pairs(N))
    E = edge_idx.shape[0]
    E_pad = -(-E // D) * D  # ceil multiple of D
    N_pad = -(-N // D) * D

    eidx_p = _pad_to(edge_idx, E_pad)
    evalid = np.zeros(E_pad, bool)
    evalid[:E] = True

    pts_p = jnp.asarray(_pad_to(np.asarray(points), N_pad))
    msk_p = jnp.asarray(_pad_to(np.asarray(mask), N_pad))

    # Stage 1: descriptors, fragment batch sharded over the mesh.
    frag_sharding = NamedSharding(mesh, P(EDGE_AXIS))
    rep = NamedSharding(mesh, P())
    extract = jax.jit(
        lambda p, x, m: extract_descriptors(p, cfg, x, m),
        in_shardings=(rep, frag_sharding, frag_sharding),
        out_shardings=rep,  # every device needs all descriptors for edges
    )
    params_r = jax.device_put(params, rep)
    desc = extract(
        params_r,
        jax.device_put(pts_p, frag_sharding),
        jax.device_put(msk_p, frag_sharding),
    )

    # Stages 2+3: edge-local registration, psum-assembled sync, refine.
    espec = P(EDGE_AXIS)
    rspec = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(rspec, rspec, espec, espec),
        out_specs=(espec, rspec, espec, espec),
        check_vma=False,
    )
    def _edges_and_sync(params, desc, eidx_l, evalid_l):
        pairs_l = register_edges(
            params, cfg, desc, eidx_l, use_filter=use_filter
        )
        conf_l = pairs_l.confidence * evalid_l
        c_l = conf_l * (conf_l >= cfg.sync.confidence_threshold)
        # fallbacks need the GLOBAL mass (single-device parity with
        # pipeline.initial_edge_weights)
        total = jax.lax.psum(jnp.sum(c_l), EDGE_AXIS)
        c_l = jnp.where(total > 1e-6, c_l, conf_l)
        if cfg.sync.overlap_gate:
            from mvreg.pipeline import overlap_gate

            gated = c_l * overlap_gate(cfg, pairs_l.overlap)
            gtotal = jax.lax.psum(jnp.sum(gated), EDGE_AXIS)
            c_l = jnp.where(gtotal > 1e-6, gated, c_l)
        # degenerate-mass guard (parity with initial_edge_weights):
        # near-zero total confidence -> uniform over VALID edges
        ctotal = jax.lax.psum(jnp.sum(c_l), EDGE_AXIS)
        c_l = jnp.where(ctotal > 1e-3, c_l, evalid_l.astype(c_l.dtype))
        c_init_l = c_l
        if cfg.sync.cycle_gate and N >= 3:
            from mvreg.sync.cycles import cycle_consistency_scores

            # triplet cycles need every edge's pose: all_gather the
            # small (E, 12)-float pose summaries, score globally,
            # slice the local shard back (parity with the single-device
            # gate in pipeline.sync_with_refine).
            Rg = jax.lax.all_gather(pairs_l.R, EDGE_AXIS, tiled=True)
            tg = jax.lax.all_gather(pairs_l.t, EDGE_AXIS, tiled=True)
            cg = jax.lax.all_gather(c_init_l, EDGE_AXIS, tiled=True)
            cyc = cycle_consistency_scores(
                Rg[:E], tg[:E], cg[:E], N,
                tau_rot_deg=cfg.sync.cycle_tau_rot,
                tau_trans=cfg.sync.cycle_tau_trans,
            )
            cyc_p = jnp.concatenate(
                [cyc, jnp.ones(E_pad - E, cyc.dtype)]
            )
            E_l = eidx_l.shape[0]
            k = jax.lax.axis_index(EDGE_AXIS)
            cyc_l = jax.lax.dynamic_slice_in_dim(cyc_p, k * E_l, E_l)
            gated = c_init_l * cyc_l ** cfg.sync.cycle_power
            gtotal = jax.lax.psum(jnp.sum(gated), EDGE_AXIS)
            c_init_l = jnp.where(gtotal > 1e-6, gated, c_init_l)

        # num_edges=E (true count): padded edges carry zero weight, so
        # the c_scale mean matches the single-device path exactly.
        R_nodes, t_nodes, w_l, r_l = sync_body_local(
            eidx_l, pairs_l.R, pairs_l.t, c_init_l,
            n_nodes=N, num_edges=E, num_iters=cfg.sync.num_iters,
            cauchy_b=cfg.sync.cauchy_b, trans_scale=cfg.sync.trans_scale,
            cauchy_b_trans=cfg.sync.cauchy_b_trans,
        )
        for _ in range(cfg.sync.refine_iters):
            i, j = eidx_l[:, 0], eidx_l[:, 1]
            R_se, t_se = tf_relative(
                R_nodes[i], t_nodes[i], R_nodes[j], t_nodes[j]
            )
            res_sync = transformation_residuals(
                R_se, t_se, pairs_l.x, pairs_l.y
            )
            w_ref = (
                (pairs_l.weights + 1e-3)
                * pairs_l.corr_mask
                / (1.0 + (res_sync / cfg.match.irls_scale) ** 2)
            )
            R2, t2, _ = jax.vmap(
                lambda xx, yy, ww: irls_kabsch(
                    xx, yy, ww, cfg.match.irls_iters, cfg.match.irls_scale
                )
            )(pairs_l.x, pairs_l.y, w_ref)
            pairs_l = pairs_l._replace(R=R2, t=t2)
            R_nodes, t_nodes, w_l, r_l = sync_body_local(
                eidx_l, pairs_l.R, pairs_l.t,
                jnp.maximum(w_l, 1e-3 * c_init_l),
                n_nodes=N, num_edges=E, num_iters=cfg.sync.num_iters,
                cauchy_b=cfg.sync.cauchy_b,
                trans_scale=cfg.sync.trans_scale,
                cauchy_b_trans=cfg.sync.cauchy_b_trans,
            )
        if cfg.sync.pose_gn_iters > 0:
            from mvreg.sync.irls import SyncResult as _SR
            from mvreg.sync.pose_gn import pose_graph_gn

            # Edge-sharded global GN: partial (H, g) from the local edge
            # shard, psum over EDGE_AXIS, replicated solve — exact
            # parity with pipeline.sync_with_refine (tested).
            gn = pose_graph_gn(
                eidx_l, pairs_l.x, pairs_l.y,
                (pairs_l.weights + 1e-3) * pairs_l.corr_mask,
                w_l,
                _SR(R=R_nodes, t=t_nodes, weights=w_l, residuals=r_l),
                num_iters=cfg.sync.pose_gn_iters,
                scale=cfg.sync.pose_gn_scale,
                scale_start=cfg.sync.pose_gn_scale_start,
                damping=cfg.sync.pose_gn_damping,
                axis_name=EDGE_AXIS, num_nodes=N,
            )
            R_nodes, t_nodes = gn.R, gn.t
        return pairs_l, (R_nodes, t_nodes), w_l, r_l

    eidx_dev = jax.device_put(
        jnp.asarray(eidx_p), NamedSharding(mesh, espec)
    )
    evalid_dev = jax.device_put(
        jnp.asarray(evalid.astype(np.float32)), NamedSharding(mesh, espec)
    )
    pairs, (R_nodes, t_nodes), w, r = jax.jit(_edges_and_sync)(
        params_r, desc, eidx_dev, evalid_dev
    )

    unpad = lambda a: a[:E]
    pairs = jax.tree_util.tree_map(unpad, pairs)
    sync = SyncResult(R=R_nodes, t=t_nodes, weights=unpad(w),
                      residuals=unpad(r))
    if cfg.sync.scene_icp_rounds > 0 or (
        cfg.sync.scene_icp_plane_rounds > 0 and desc.normals is not None
    ):
        # replicated (cheap) — identical math to the single-device path,
        # including its plane-only gate (ADVICE r4)
        from mvreg.sync.refine import scene_icp_refine

        desc_n = jax.tree_util.tree_map(lambda a: a[:N], desc)
        sync = jax.jit(
            lambda d, s: scene_icp_refine(
                d.centers, d.mask, s, rounds=cfg.sync.scene_icp_rounds,
                icp_iters=cfg.match.icp_iters if cfg.match.icp_iters > 0
                else 3,
                scale=cfg.match.icp_scale,
                trust_radius=cfg.match.icp_trust_radius,
                normals=d.normals,
                nweights=d.nweights,
                plane_rounds=(
                    cfg.sync.scene_icp_plane_rounds
                    if d.normals is not None else 0
                ),
                min_inliers=cfg.match.icp_min_inliers,
            )
        )(desc_n, sync)
    return SceneResult(edge_idx=jnp.asarray(edge_idx), pairs=pairs,
                       sync=sync)
