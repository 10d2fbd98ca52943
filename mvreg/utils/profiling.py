"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference has no profiler integration; here every pipeline stage is
wrapped in `jax.named_scope` (visible in XLA HLO and TensorBoard traces)
and `trace()` captures a device profile viewable with
tensorboard-plugin-profile.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into `logdir`.

    View with: tensorboard --logdir <logdir> (profile plugin installed).
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


scope = jax.named_scope  # re-export: annotate pipeline stages


class StageTimer:
    """Wall-clock stage timing with a device-readback barrier.

    On the axon relay, block_until_ready is not a completion barrier
    (returns early); reading bytes back is. `sync` pulls a few bytes of
    the given array to host before reading the clock.
    """

    def __init__(self) -> None:
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_output=None):
        t0 = time.perf_counter()
        yield
        if sync_output is not None:
            self.barrier(sync_output)
        self.times[name] = self.times.get(name, 0.0) + (
            time.perf_counter() - t0
        )

    @staticmethod
    def barrier(x) -> None:
        import numpy as np

        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf.ravel()[:1])

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [
            f"  {k}: {v * 1e3:8.1f} ms ({v / total * 100:4.1f}%)"
            for k, v in sorted(
                self.times.items(), key=lambda kv: -kv[1]
            )
        ]
        return "\n".join(lines)
