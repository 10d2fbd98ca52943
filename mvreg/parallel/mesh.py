"""Device mesh and sharding helpers.

The reference is single-GPU/single-process (SURVEY.md §2.4: no
torch.distributed anywhere); distribution here is an addition mandated by
the driver [B:configs[4]]. The design follows the scaling-book recipe:
one global `Mesh`, shardings annotated on the data, XLA inserts the
collectives.

Mesh axes:
  edge:  data parallelism over independent pairwise-registration problems
         (the dominant axis — fragment pairs / pose-graph edges are
         embarrassingly parallel until the sync reduction)
  model: reserved for intra-model sharding (unused by default — the nets
         are a few M params; SURVEY.md §2.4)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

EDGE_AXIS = "edge"
MODEL_AXIS = "model"


def make_mesh(
    n_edge: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build the global 2D mesh (edge-parallel × model-parallel).

    Defaults to all visible devices on the edge axis.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_edge is None:
        n_edge = devices.size // n_model
    assert n_edge * n_model <= devices.size, (
        f"mesh {n_edge}x{n_model} needs more than {devices.size} devices"
    )
    grid = devices[: n_edge * n_model].reshape(n_edge, n_model)
    return Mesh(grid, (EDGE_AXIS, MODEL_AXIS))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (edge/batch) dim across the edge axis."""
    return NamedSharding(mesh, P(EDGE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of arrays with leading batch dim on the edge axis."""
    s = edge_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
