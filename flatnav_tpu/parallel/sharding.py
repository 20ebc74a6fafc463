"""Mesh and sharding helpers for multi-chip execution.

The reference is single-node shared-memory (SURVEY.md §2.6); its
parallelism axes map onto a JAX device mesh as:

  * `data` axis — the analog of the reference's thread pool
    (util/Multithreading.h): queries and insertion waves shard across
    chips, graph replicated. Linear QPS scaling while the index fits in
    one chip's HBM.
  * `model` axis — tensor-parallel sharding of the node table (vectors,
    links, labels row-sharded) for indexes larger than one chip's HBM
    (BigANN-100M-scale). Per-hop candidate merging rides ICI collectives.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    data: int | None = None,
    model: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    devices = list(devices or jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data} x {model} != {n} devices"
    return Mesh(
        np.asarray(devices).reshape(data, model), (DATA_AXIS, MODEL_AXIS)
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Batch dimension sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Node-table rows sharded over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS))
