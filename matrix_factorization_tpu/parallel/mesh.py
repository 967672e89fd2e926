"""Device mesh construction and sharding helpers.

Axis convention (see ``core.config.MeshConfig``):
* ``data``  — shards the rating stream and the user-side tables (users are
  the data axis of this workload: P rows ride with their ratings).
* ``model`` — shards the item catalog for full-catalog scoring / top-k.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh. ``n_data=-1`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))


def device_put_replicated(x, mesh: Mesh):
    return jax.device_put(x, replicated(mesh))


def device_put_row_sharded(x, mesh: Mesh, axis: str = DATA_AXIS):
    return jax.device_put(x, row_sharded(mesh, axis))
