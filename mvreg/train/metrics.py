"""Metric logging: stdout + TensorBoard via CLU when available.

Counterpart of `ref:lib/logger.py` + tensorboard scalars (SURVEY.md C15,
§5.5). CLU's MetricWriter handles TensorBoard summaries and is multi-host
aware; we degrade to plain logging if it's unavailable.
"""

from __future__ import annotations

import logging
import time
from typing import Mapping

logger = logging.getLogger("mvreg")


class MetricLogger:
    def __init__(self, logdir: str | None = None, every: int = 10):
        self.every = every
        self._writer = None
        self._t0 = time.time()
        self._last_step = 0
        self._last_time = self._t0
        if logdir is not None:
            try:
                from clu import metric_writers

                self._writer = metric_writers.create_default_writer(logdir)
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboard writer unavailable: %s", e)

    def log(self, step: int, metrics: Mapping[str, float]) -> None:
        if step % self.every:
            return
        vals = {k: float(v) for k, v in metrics.items()}
        now = time.time()
        dsteps = max(step - self._last_step, 1)
        vals["steps_per_s"] = dsteps / max(now - self._last_time, 1e-9)
        self._last_step, self._last_time = step, now
        if self._writer is not None:
            self._writer.write_scalars(step, vals)
        logger.info(
            "step %d | %s", step,
            " ".join(f"{k}={v:.4f}" for k, v in sorted(vals.items())),
        )

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()
