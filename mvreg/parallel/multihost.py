"""Multi-host runtime setup (driver config 4; SURVEY.md §2.4, §5.8).

The reference is strictly single-process; this module is the entry point
for running mvreg across N hosts: `jax.distributed.initialize` + a global
mesh over all hosts' devices, with per-host data shards assembled into
global arrays. On a TPU pod slice the same code path runs over ICI/DCN;
on CPU (tests, this environment) it runs over localhost gloo — exercised
by tests/test_multihost.py with real separate processes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvreg.parallel.mesh import EDGE_AXIS, MODEL_AXIS

Array = jax.Array


def init_multihost(
    coordinator: str,
    num_processes: int,
    process_id: int,
    cpu_devices_per_process: int | None = None,
) -> None:
    """Initialize the distributed runtime. Call before any backend use.

    On TPU pods the three arguments come from the cluster environment and
    can be omitted (jax auto-detects); here they are explicit so CPU
    multi-process tests can drive it.
    """
    if cpu_devices_per_process is not None:
        jax.config.update("jax_platforms", "cpu")
        try:
            jax.config.update("jax_num_cpu_devices", cpu_devices_per_process)
        except Exception:  # older jax: fall back to XLA flag
            import os

            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count="
                f"{cpu_devices_per_process}"
            )
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator, num_processes=num_processes, process_id=process_id
    )


def global_mesh(n_model: int = 1) -> Mesh:
    """Global mesh over every device of every host (edge-major)."""
    devices = np.asarray(jax.devices())
    n_edge = devices.size // n_model
    return Mesh(
        devices[: n_edge * n_model].reshape(n_edge, n_model),
        (EDGE_AXIS, MODEL_AXIS),
    )


def global_edge_array(mesh: Mesh, host_local: np.ndarray, global_shape):
    """Assemble per-host edge shards into one global edge-sharded array.

    host_local: this process's contiguous shard along axis 0 (the global
    edge order is process-major: process p owns rows
    [p*E/P, (p+1)*E/P)).
    """
    sharding = NamedSharding(mesh, P(EDGE_AXIS))
    return jax.make_array_from_process_local_data(
        sharding, host_local, global_shape
    )


def replicated_array(mesh: Mesh, value: np.ndarray):
    """A fully-replicated global array (same value on every host)."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(
        sharding, value, value.shape
    )
