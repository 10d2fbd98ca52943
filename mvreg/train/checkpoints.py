"""Orbax checkpointing of the train state.

Counterpart of `ref:lib/checkpoints.py` (`torch.save/load` of model +
optimizer + epoch; SURVEY.md C14) — here orbax-checkpoint, which is
async-capable and multi-host aware out of the box (SURVEY.md §5.3/5.4):
every host participates in the save, and restore-on-preemption is just
`restore(latest_step)`.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from mvreg.train.state import TrainState


class CheckpointManager:
    """Thin wrapper: save/restore TrainState, keep best + latest."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, metrics: dict | None = None) -> None:
        step = int(state.step)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        """Restore into the structure of `template` (shapes/dtypes)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template
        )
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )

    def close(self) -> None:
        self._mgr.close()
