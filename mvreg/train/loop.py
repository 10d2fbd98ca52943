"""Jitted train step and training loop.

Counterpart of the reference's epoch loop (`ref:lib/trainer.py::Trainer`,
call stack SURVEY.md §3.1), redesigned TPU-first: the entire step —
voxelize, descriptor UNet, matching, filtering, Procrustes, losses,
backward, optimizer — is ONE compiled program; the batch of fragment
pairs shards over the mesh's `edge` axis and gradient all-reduce is the
pjit-inserted psum (SURVEY.md §2.4 DP row).

Training stages mirror the reference protocol (descriptor pretrained,
filtering/confidence trained on top — SURVEY.md §7 hard-part 3):
  stage="descriptor"  hardest-contrastive only
  stage="filter"      BCE + transformation + confidence (desc frozen)
  stage="confidence"  confidence-head BCE alone (desc + filter frozen,
                      BN stats frozen) — post-hoc calibration of the
                      edge-success predictor without touching the trunk
  stage="joint"       everything, soft-match gradients into the backbone
  stage="sync"        multiview fine-tune THROUGH the synchronization
                      layer (gradients via eigh_safe; SURVEY.md §0 — the
                      reference trains end-to-end through the SVD and the
                      eigendecomposition), on SceneBatches of N fragments
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import optax

import jax
import jax.numpy as jnp

from mvreg.config.schema import PipelineConfig
from mvreg.core.metrics import rotation_error_deg, translation_error
from mvreg.core.procrustes import irls_kabsch
from mvreg.core.metrics import transformation_residuals
from mvreg.models.fcgf import build_unet_plan
from mvreg.models.filtering import edge_statistics
from mvreg.ops.knn import mutual_match
from mvreg.pipeline import Descriptors, make_models, select_keypoints
from mvreg.train import losses as L
from mvreg.train.state import TrainState, make_optimizer, merge_variables

Array = jax.Array


class PairBatch(NamedTuple):
    """A batch of training fragment pairs (host-built, device-ready).

    points: (B, 2, P, 3); mask: (B, 2, P)
    R_ij, t_ij: (B, 3, 3), (B, 3) — GT transform fragment0 -> fragment1
    """

    points: Array
    mask: Array
    R_ij: Array
    t_ij: Array


class SceneBatch(NamedTuple):
    """A batch of training scenes for the sync fine-tune stage.

    points: (B, N, P, 3); mask: (B, N, P)
    R_gt, t_gt: (B, N, 3, 3), (B, N, 3) — GT absolute poses (local->world)
    """

    points: Array
    mask: Array
    R_gt: Array
    t_gt: Array


def _descriptors_train(params, stats, cfg, points, mask, update_bn=True):
    """Descriptor forward in train mode, returning updated batch stats.

    update_bn=False runs BatchNorm on its running averages (stats pass
    through unchanged) while parameters still receive gradients — the
    sync stage uses this: its tiny per-scene batches would otherwise
    drag the BN statistics away from the pair-training distribution
    (one ingredient of the round-2 v5 descriptor collapse).
    """
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
        desc = fcgf.apply(
            {"params": params["fcgf"]}, centers, grids.mask, train=True
        )
        d = Descriptors(feats=desc, centers=centers, mask=grids.mask)
        return d, stats["fcgf"]
    from mvreg.models.fcgf import plan_lookup

    plan = build_unet_plan(
        points, mask, cfg.voxel.voxel_size, cfg.voxel.capacities,
        cfg.voxel.kernel_size, plan_lookup(cfg.model, cfg.voxel),
        taps=cfg.model.kernel_taps,
    )
    from mvreg.pipeline import input_features, voxel_positions

    feats = input_features(plan)
    if update_bn:
        desc, upd = fcgf.apply(
            {"params": params["fcgf"], "batch_stats": stats["fcgf"]},
            plan, feats, train=True, mutable=["batch_stats"],
        )
        new_stats = upd["batch_stats"]
    else:
        desc = fcgf.apply(
            {"params": params["fcgf"], "batch_stats": stats["fcgf"]},
            plan, feats, train=False,
        )
        new_stats = stats["fcgf"]
    centers = voxel_positions(cfg, plan, points)
    d = Descriptors(feats=desc, centers=centers, mask=plan.masks[0])
    return d, new_stats


def loss_fn(
    params: Any,
    stats: Any,
    cfg: PipelineConfig,
    batch: PairBatch,
    stage: str,
) -> tuple[Array, tuple[Any, dict]]:
    """Combined loss over a batch of pairs. Returns (loss, (stats, metrics))."""
    B, _, P, _ = batch.points.shape
    flat_pts = batch.points.reshape(B * 2, P, 3)
    flat_mask = batch.mask.reshape(B * 2, P)

    if stage in ("filter", "confidence"):
        params_desc = jax.lax.stop_gradient(params)
    else:
        params_desc = params
    desc, new_fcgf_stats = _descriptors_train(
        params_desc, stats, cfg, flat_pts, flat_mask,
        # confidence calibration must not drift the descriptor BN stats
        update_bn=stage != "confidence",
    )
    d0 = jax.tree_util.tree_map(lambda a: a.reshape(B, 2, *a.shape[1:])[:, 0], desc)
    d1 = jax.tree_util.tree_map(lambda a: a.reshape(B, 2, *a.shape[1:])[:, 1], desc)

    metrics = {}
    total = jnp.zeros(())

    # --- descriptor: hardest-contrastive over each pair
    if stage in ("descriptor", "joint"):
        contr, caux = jax.vmap(
            lambda da, ca, ma, db, cb, mb, R, t: L.hardest_contrastive_loss(
                da, ca, ma, db, cb, mb, R, t,
                pos_radius=1.5 * cfg.voxel.voxel_size,
                safe_radius=4.0 * cfg.voxel.voxel_size,
            )
        )(d0.feats, d0.centers, d0.mask, d1.feats, d1.centers, d1.mask,
          batch.R_ij, batch.t_ij)
        contr = jnp.mean(contr)
        metrics["loss_contrastive"] = contr
        metrics["d_pos"] = jnp.mean(caux["d_pos"])
        metrics["d_neg"] = jnp.mean(caux["d_neg"])
        metrics["n_pos_pairs"] = jnp.mean(caux["n_pos_pairs"])
        total = total + contr

    # --- filtering + pose + confidence on matched correspondences
    if stage in ("filter", "joint", "confidence"):
        # stage="confidence": post-hoc recalibration of the confidence
        # head alone (round-4 VERDICT item 4 — v8k19's extended tune
        # dragged mean NEGATIVE-pair confidence to 0.76). The trunk
        # (descriptor + filter) is frozen twice over: stop_gradient here
        # and an update mask in make_train_step (zero grads alone would
        # still let restored Adam momenta drift the frozen groups).
        _, fnet, cnet = make_models(cfg)
        K = cfg.match.num_corr

        def pair_corr(da, db):
            fd, fc, fm = select_keypoints(da.feats, da.centers, da.mask, K)
            desc_for_match = jax.lax.stop_gradient  # NN match is not diff.
            idx, _, mut = mutual_match(
                desc_for_match(fd), fm,
                desc_for_match(db.feats), db.mask,
            )
            y = db.centers[idx]
            cm = fm & mut
            return fc * cm[:, None], y * cm[:, None], cm

        x, y, cm = jax.vmap(pair_corr)(d0, d1)
        corr = jnp.concatenate([x, y], axis=-1)
        if stage == "confidence":
            # frozen trunk: inference-mode filter on running BN stats
            logits, w = fnet.apply(
                {"params": jax.lax.stop_gradient(params["filter"]),
                 "batch_stats": stats["filter"]},
                corr, cm.astype(corr.dtype), train=False,
            )
            fupd = None
        else:
            (logits, w), fupd = fnet.apply(
                {"params": params["filter"],
                 "batch_stats": stats["filter"]},
                corr, cm.astype(corr.dtype), train=True,
                mutable=["batch_stats"],
            )
        labels = L.inlier_labels(
            x, y, batch.R_ij, batch.t_ij, cm,
            tau=cfg.filter.inlier_threshold,
        )
        cls = L.classification_loss(logits, labels, cm)
        metrics["loss_classification"] = cls
        if stage != "confidence":
            total = total + cls

        # Uniform 1e-3 prior mass: Kabsch is weight-scale-invariant, so
        # this barely moves the solution when the filter is confident, but
        # bounds d(1/Σw) when it outputs ~zero everywhere (NaN guard).
        w_eff = w * cm + 1e-3 * cm
        R_est, t_est, _ = jax.vmap(
            lambda xx, yy, ww: irls_kabsch(
                xx, yy, ww, cfg.match.irls_iters, cfg.match.irls_scale
            )
        )(x, y, w_eff)
        # Pose loss only on pairs with enough GT inliers among the putative
        # matches — a pair whose matches contain no true correspondences
        # cannot supervise the pose (the reference trains only on >30%%-
        # overlap pairs for the same reason, SURVEY.md C11).
        has_inl = (jnp.sum(labels * cm, axis=-1) >= 10).astype(w.dtype)
        rot_l = jnp.sum((R_est - batch.R_ij) ** 2, axis=(-2, -1))
        tr_l = jnp.sum((t_est - batch.t_ij) ** 2, axis=-1)
        tl = jnp.sum((rot_l + tr_l) * has_inl) / jnp.maximum(
            jnp.sum(has_inl), 1.0
        )
        metrics["loss_transformation"] = tl
        metrics["frac_supervised_pairs"] = jnp.mean(has_inl)
        if stage != "confidence":
            total = total + 0.3 * tl

        # confidence: predict pairwise success (rot err < 15 deg)
        res = transformation_residuals(R_est, t_est, x, y)
        stats_e = edge_statistics(w, cm.astype(w.dtype), res)
        conf = cnet.apply({"params": params["confidence"]}, stats_e)
        rot_err = rotation_error_deg(R_est, batch.R_ij)
        success = (rot_err < 15.0).astype(conf.dtype)
        conf_bce = -jnp.mean(
            success * jnp.log(conf + 1e-6)
            + (1 - success) * jnp.log(1 - conf + 1e-6)
        )
        metrics["loss_confidence"] = conf_bce
        # the calibration stage optimizes the confidence BCE ALONE (at
        # full weight); the joint stages keep the 0.3 auxiliary weight
        total = total + (
            conf_bce if stage == "confidence" else 0.3 * conf_bce
        )
        metrics["mean_confidence_pos"] = jnp.sum(
            conf * success
        ) / jnp.maximum(jnp.sum(success), 1.0)
        metrics["mean_confidence_neg"] = jnp.sum(
            conf * (1 - success)
        ) / jnp.maximum(jnp.sum(1 - success), 1.0)

        metrics["rot_err_deg"] = jnp.mean(rot_err)
        metrics["trans_err"] = jnp.mean(
            translation_error(t_est, batch.t_ij)
        )
        npos = jnp.maximum(jnp.sum(labels * cm), 1.0)
        metrics["inlier_recall"] = jnp.sum((w > 0.5) * labels * cm) / npos

    new_stats = dict(stats)
    new_stats["fcgf"] = new_fcgf_stats
    if stage in ("filter", "joint") and fupd is not None:
        new_stats["filter"] = fupd["batch_stats"]
    metrics["loss_total"] = total
    return total, (new_stats, metrics)


def sync_loss_fn(
    params: Any,
    stats: Any,
    cfg: PipelineConfig,
    batch: SceneBatch,
) -> tuple[Array, tuple[Any, dict]]:
    """Multiview fine-tune loss THROUGH the synchronization layer (C7/C8).

    Runs the full scene path — descriptors (frozen), matching, filtering,
    robust Procrustes, confidence, IRLS spectral sync — and supervises the
    *synchronized* poses with a gauge-invariant relative-pose loss, so
    gradients reach the filtering and confidence nets through `eigh_safe`
    and the translation solve (the reference's end-to-end multiview
    training, SURVEY.md §0 / §7 hard-part 3).
    """
    from mvreg.core.transforms import relative as tf_relative
    from mvreg.ops.knn import soft_match
    from mvreg.pipeline import all_pairs
    from mvreg.sync.irls import synchronize

    B, N, P, _ = batch.points.shape
    flat_pts = batch.points.reshape(B * N, P, 3)
    flat_mask = batch.mask.reshape(B * N, P)

    # With sync_train_descriptor, gradients reach the descriptor UNet
    # through soft-argmax matching (the reference's end-to-end protocol,
    # SURVEY.md §0); otherwise the descriptor stays frozen and matching
    # is hard mutual-NN (non-differentiable, like the staged protocol).
    e2e = cfg.train.sync_train_descriptor
    desc_params = params if e2e else jax.lax.stop_gradient(params)
    # BN stats frozen in the sync stage regardless of e2e: per-scene
    # batches are tiny and would corrupt the running averages.
    desc, new_fcgf_stats = _descriptors_train(
        desc_params, stats, cfg, flat_pts, flat_mask, update_bn=False
    )
    d = jax.tree_util.tree_map(
        lambda a: a.reshape(B, N, *a.shape[1:]), desc
    )
    edge_idx = all_pairs(N)  # (E, 2) static
    E = edge_idx.shape[0]
    K = cfg.match.num_corr
    _, fnet, cnet = make_models(cfg)

    def scene_corr(d_scene):
        def edge_corr(e):
            di = jax.tree_util.tree_map(lambda a: a[e[0]], d_scene)
            dj = jax.tree_util.tree_map(lambda a: a[e[1]], d_scene)
            fd, fc, fm = select_keypoints(di.feats, di.centers, di.mask, K)
            if e2e:
                y = soft_match(
                    fd, fm, dj.feats, dj.mask, dj.centers,
                    cfg.match.soft_temperature,
                )
                cm = fm
            else:
                idx, _, mut = mutual_match(fd, fm, dj.feats, dj.mask)
                y = dj.centers[idx]
                cm = fm & mut
            return fc * cm[:, None], y * cm[:, None], cm

        return jax.vmap(edge_corr)(edge_idx)

    x, y, cm = jax.vmap(scene_corr)(d)  # (B, E, K, 3), ..., (B, E, K)

    corr = jnp.concatenate([x, y], axis=-1).reshape(B * E, K, 6)
    cm_f = cm.reshape(B * E, K)
    (logits, w), fupd = fnet.apply(
        {"params": params["filter"], "batch_stats": stats["filter"]},
        corr, cm_f.astype(corr.dtype), train=True, mutable=["batch_stats"],
    )
    xf, yf = x.reshape(B * E, K, 3), y.reshape(B * E, K, 3)
    w_eff = w * cm_f + 1e-3 * cm_f
    R_e, t_e, _ = jax.vmap(
        lambda xx, yy, ww: irls_kabsch(
            xx, yy, ww, cfg.match.irls_iters, cfg.match.irls_scale
        )
    )(xf, yf, w_eff)
    res = transformation_residuals(R_e, t_e, xf, yf)
    stats_e = edge_statistics(w, cm_f.astype(w.dtype), res)
    conf = cnet.apply({"params": params["confidence"]}, stats_e)
    conf = conf.reshape(B, E)

    # Synchronize each scene; gradients flow through eigh_safe + solve.
    c_init = conf * (conf >= cfg.sync.confidence_threshold)
    c_init = jnp.where(
        jnp.sum(c_init, axis=-1, keepdims=True) > 1e-6, c_init, conf
    )
    sync = jax.vmap(
        lambda R, t, c: synchronize(
            edge_idx, R, t, c, n_nodes=N, num_iters=cfg.sync.num_iters,
            cauchy_b=cfg.sync.cauchy_b, trans_scale=cfg.sync.trans_scale,
            cauchy_b_trans=cfg.sync.cauchy_b_trans,
        )
    )(R_e.reshape(B, E, 3, 3), t_e.reshape(B, E, 3), c_init)

    # Gauge-invariant supervision: synced relative poses vs GT relatives.
    i, j = edge_idx[:, 0], edge_idx[:, 1]
    R_gt_ij, t_gt_ij = jax.vmap(
        lambda Rg, tg: tf_relative(Rg[i], tg[i], Rg[j], tg[j])
    )(batch.R_gt, batch.t_gt)
    R_sy_ij, t_sy_ij = jax.vmap(
        lambda Rs, ts: tf_relative(Rs[i], ts[i], Rs[j], ts[j])
    )(sync.R, sync.t)
    rot_l = jnp.mean(jnp.sum((R_sy_ij - R_gt_ij) ** 2, axis=(-2, -1)))
    # Chordal rot term is bounded (<= 8/edge) but translation L2 is not:
    # a collapsed sync on a degenerate graph explodes it (observed >13)
    # and its gradient with it. Cauchy-robustify at a 1 m scale — quadratic
    # near zero, logarithmic growth on outlier scenes.
    t_d2 = jnp.sum((t_sy_ij - t_gt_ij) ** 2, axis=-1)
    tr_l = jnp.mean(jnp.log1p(t_d2))
    total = rot_l + 0.5 * tr_l

    # Keep pairwise heads anchored: BCE on inliers + confidence BCE.
    labels = L.inlier_labels(
        xf, yf,
        R_gt_ij.reshape(B * E, 3, 3), t_gt_ij.reshape(B * E, 3),
        cm_f, tau=cfg.filter.inlier_threshold,
    )
    cls = L.classification_loss(logits, labels, cm_f)
    rot_err_pair = rotation_error_deg(R_e, R_gt_ij.reshape(B * E, 3, 3))
    success = (rot_err_pair < 15.0).astype(conf.dtype).reshape(B, E)
    conf_bce = -jnp.mean(
        success * jnp.log(conf + 1e-6)
        + (1 - success) * jnp.log(1 - conf + 1e-6)
    )
    total = total + cls + 0.3 * conf_bce

    rot_err_sync = rotation_error_deg(
        R_sy_ij.reshape(B * E, 3, 3), R_gt_ij.reshape(B * E, 3, 3)
    )
    metrics = {
        "loss_total": total,
        "loss_sync_rot": rot_l,
        "loss_sync_trans": tr_l,
        "loss_classification": cls,
        "loss_confidence": conf_bce,
        "sync_rot_err_deg": jnp.mean(rot_err_sync),
        "pair_rot_err_deg": jnp.mean(rot_err_pair),
    }
    new_stats = dict(stats)
    new_stats["fcgf"] = new_fcgf_stats
    new_stats["filter"] = fupd["batch_stats"]
    return total, (new_stats, metrics)


def make_train_step(
    cfg: PipelineConfig, stage: str = "joint"
) -> Callable[[TrainState, PairBatch], tuple[TrainState, dict]]:
    """Build the jitted train step (donated state for in-place updates)."""
    tx = make_optimizer(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        if stage == "sync":
            lf = lambda p, s, c, b: sync_loss_fn(p, s, c, b)
        else:
            lf = lambda p, s, c, b: loss_fn(p, s, c, b, stage)
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(state.params, state.batch_stats, cfg, batch)
        # Zero non-finite gradients before clipping: one NaN leaf (e.g.
        # an eigh backward on a near-degenerate pose graph in the sync
        # stage) otherwise turns the clipped global norm — and then every
        # parameter — into NaN in a single step. Stateless on purpose so
        # the opt_state pytree (and checkpoint compat) is unchanged.
        bad = jnp.any(
            jnp.asarray(
                [jnp.any(~jnp.isfinite(g))
                 for g in jax.tree_util.tree_leaves(grads)]
            )
        )
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads
        )
        metrics["nonfinite_grad_steps"] = bad.astype(jnp.float32)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if stage == "confidence":
            # Hard-freeze everything but the confidence head WITHOUT
            # changing the opt_state pytree (checkpoint compat): zero
            # grads alone are not enough — restored Adam momenta would
            # still move the frozen groups.
            updates = {
                k: (v if k == "confidence"
                    else jax.tree_util.tree_map(jnp.zeros_like, v))
                for k, v in updates.items()
            }
        if cfg.train.descriptor_lr_scale != 1.0:
            # Per-group learning rate WITHOUT changing the opt_state
            # pytree (checkpoint compat): scale the descriptor's final
            # Adam update. The round-2 v5 e2e-sync collapse came from
            # the descriptor moving as fast as the sync head (VERDICT
            # item 6 prescribes 10-100x slower).
            s = cfg.train.descriptor_lr_scale
            updates = {
                k: (jax.tree_util.tree_map(lambda u: u * s, v)
                    if k == "fcgf" else v)
                for k, v in updates.items()
            }
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                step=state.step + 1,
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            metrics,
        )

    return step


def registration_params(state: TrainState):
    """Extract inference-ready RegistrationParams from a train state."""
    return merge_variables(state.params, state.batch_stats)
