"""Train state: parameters, batch stats, optimizer.

Counterpart of the reference trainer's model/optimizer bookkeeping
(`ref:lib/trainer.py::Trainer`, `ref:train.py`; SURVEY.md C13). Optax
Adam with exponential decay mirrors the reference's schedule family; the
state is a pure pytree so it shards/replicates with pjit and checkpoints
with orbax unchanged.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax

from mvreg.config.schema import PipelineConfig
from mvreg.pipeline import RegistrationParams, init_params

Array = jax.Array


class TrainState(NamedTuple):
    step: Array
    params: Any  # {"fcgf": ..., "filter": ..., "confidence": ...}
    batch_stats: Any  # same structure (empty dicts where unused)
    opt_state: Any


def split_variables(reg: RegistrationParams) -> tuple[dict, dict]:
    """Split flax variable dicts into (params, batch_stats) pytrees."""
    params = {}
    stats = {}
    for name, v in reg._asdict().items():
        params[name] = v.get("params", {})
        stats[name] = v.get("batch_stats", {})
    return params, stats


def merge_variables(params: dict, stats: dict) -> RegistrationParams:
    out = {}
    for name in ("fcgf", "filter", "confidence"):
        d = {"params": params[name]}
        if stats.get(name):
            d["batch_stats"] = stats[name]
        out[name] = d
    return RegistrationParams(**out)


def make_optimizer(cfg: PipelineConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.train.learning_rate,
        transition_steps=1000,
        decay_rate=cfg.train.lr_decay,
    )
    opt = (
        optax.adamw(schedule, weight_decay=cfg.train.weight_decay)
        if cfg.train.weight_decay > 0
        else optax.adam(schedule)
    )
    # Garbage early-training correspondences can spike gradients through
    # the Procrustes solve; global-norm clipping keeps the step bounded.
    # (NaN gradients are zeroed in the train step itself — see
    # loop.py::make_train_step — NOT via optax.zero_nans, which would
    # change the opt_state pytree and break restore of existing
    # checkpoints.)
    return optax.chain(optax.clip_by_global_norm(1.0), opt)


def create_train_state(key: Array, cfg: PipelineConfig) -> TrainState:
    reg = init_params(key, cfg)
    params, stats = split_variables(reg)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
    )
