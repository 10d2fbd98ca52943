#!/usr/bin/env python
"""Training CLI.

Counterpart of `ref:train.py` (SURVEY.md §3.1): config in, checkpoints +
metrics out. Stages follow the reference protocol — descriptor
(contrastive) pretraining, then filtering/confidence, then optional joint
fine-tuning.

Usage:
  python scripts/train.py --stage descriptor --steps 2000 \
      [--config cfg.yaml] [--ckpt-dir runs/exp1] [--resume]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu() -> None:
    """Hard-select the CPU backend (the axon TPU relay is single-
    client; a stray CPU-intended process would block real TPU jobs;
    env vars don't survive the container's sitecustomize)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def main() -> None:
    from mvreg.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="run on the CPU backend")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--stage", default="joint",
                    choices=["descriptor", "filter", "confidence",
                             "joint", "sync"])
    ap.add_argument("--fragments", type=int, default=4,
                    help="fragments per scene (sync stage only)")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ckpt-dir", type=str, default="runs/default")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--pool-pairs", type=int, default=256,
                    help="fixed dataset size (0 = fresh scene per step)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--set", action="append", default=[],
                    help="dotted config override, e.g. train.batch_pairs=8")
    args = ap.parse_args()
    if args.cpu:
        _force_cpu()

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    import jax

    from mvreg.config.schema import resolve_config, save_yaml
    from mvreg.data.batching import synthetic_pair_stream
    from mvreg.train.checkpoints import CheckpointManager
    from mvreg.train.loop import make_train_step
    from mvreg.train.metrics import MetricLogger
    from mvreg.train.state import create_train_state

    # On --resume, the checkpoint's saved config is the base (so later
    # stages inherit the train-time voxel/model settings automatically).
    cfg = resolve_config(
        args.config, args.ckpt_dir if args.resume else None, args.set
    )
    steps = args.steps if args.steps is not None else cfg.train.steps
    os.makedirs(args.ckpt_dir, exist_ok=True)

    state = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg)
    mgr = CheckpointManager(args.ckpt_dir)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(state)
        logging.info("resumed from step %d", int(state.step))
    # Record the train-time config only once the restore (if any) has
    # validated that cfg matches the stored weights — a failed resume
    # must not clobber the checkpoint's authoritative config.yaml.
    save_yaml(cfg, os.path.join(args.ckpt_dir, "config.yaml"))

    step_fn = make_train_step(cfg, stage=args.stage)
    mlog = MetricLogger(os.path.join(args.ckpt_dir, "tb"), args.log_every)
    if args.stage == "sync":
        from mvreg.data.batching import synthetic_scene_stream

        stream = synthetic_scene_stream(
            cfg.train.seed, cfg.train.batch_pairs, args.fragments,
            args.points, pool_scenes=args.pool_pairs,
        )
    else:
        stream = synthetic_pair_stream(
            cfg.train.seed, cfg.train.batch_pairs, args.points,
            pool_pairs=args.pool_pairs,
            shift_range=(cfg.train.shift_min, cfg.train.shift_max),
            negative_fraction=cfg.train.negative_fraction,
            richness=cfg.train.world_richness,
        )

    start = int(state.step)
    for k, batch in enumerate(stream):
        if start + k >= steps:
            break
        state, metrics = step_fn(state, batch)
        mlog.log(int(state.step), metrics)
        loss = float(metrics["loss_total"])
        if loss != loss:  # NaN guard: never checkpoint a poisoned state
            logging.error(
                "non-finite loss at step %d — halting WITHOUT saving "
                "(last good checkpoint: %s)", int(state.step),
                mgr.latest_step(),
            )
            mlog.flush()
            sys.exit(3)
        if int(state.step) % cfg.train.checkpoint_every == 0:
            mgr.save(state, {"loss": loss})
    mgr.save(state)
    mlog.flush()
    logging.info("done at step %d", int(state.step))


if __name__ == "__main__":
    main()
