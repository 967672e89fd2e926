"""Device mesh construction and sharding helpers.

Axis convention (see ``core.config.MeshConfig``):
* ``slice`` — optional DCN-major outer axis for multi-slice topologies
  (inter-slice traffic rides the data-center network, ~10-100x slower
  than ICI: keep per-step collectives off it where possible).
* ``data``  — shards the rating stream and the user-side tables (users are
  the data axis of this workload: P rows ride with their ratings).
* ``model`` — shards the item catalog for full-catalog scoring / top-k.

Communication placement (SURVEY §5.8): with ratings sharded by user over
``(slice, data)``, the user-side updates are always local; the ONLY
cross-slice traffic in ``dp_fit`` is the per-step item-delta ``psum``
(unavoidable for synchronous SGD), and ``dp_tp_fit`` keeps its item
gathers ICI-local by sharding Q over ``model`` (an intra-slice axis) and
replicating the shards across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "slice"
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


def make_multislice_mesh(
    n_slices: int,
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (slice, data, model) mesh with a DCN-major outer axis.

    Devices are grouped slice-major: on real multi-slice hardware pass
    devices ordered by slice (``jax.devices()`` already is; or use
    ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` and wrap
    the result), so that the inner ``(data, model)`` axes stay within a
    slice (ICI) and only the outer axis crosses DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data == -1:
        n_data = len(devices) // (n_slices * n_model)
    need = n_slices * n_data * n_model
    if need > len(devices) or n_data < 1:
        raise ValueError(
            f"mesh {n_slices}x{n_data}x{n_model} needs {need} devices, "
            f"have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(n_slices, n_data, n_model)
    return Mesh(grid, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def data_axes_of(mesh: Mesh) -> tuple:
    """The axes the rating stream / user table shard over: ``data``, plus
    the DCN ``slice`` axis when present (slice-major order)."""
    return tuple(a for a in (DCN_AXIS, DATA_AXIS) if a in mesh.axis_names)


def data_size_of(mesh: Mesh) -> int:
    """Total device count across the data axes (1 = no data parallelism)."""
    n = 1
    for a in data_axes_of(mesh):
        n *= mesh.shape[a]
    return n


def device_index(mesh: Mesh):
    """Linear device index over the data axes — callable only inside
    ``shard_map`` (it reads ``lax.axis_index``); used to fold per-device
    randomness deterministically."""
    import jax.numpy as jnp

    dev = jnp.int32(0)
    for a in data_axes_of(mesh):
        dev = dev * mesh.shape[a] + jax.lax.axis_index(a)
    return dev


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))


def device_put_replicated(x, mesh: Mesh):
    return jax.device_put(x, replicated(mesh))


def device_put_row_sharded(x, mesh: Mesh, axis: str = DATA_AXIS):
    return jax.device_put(x, row_sharded(mesh, axis))
