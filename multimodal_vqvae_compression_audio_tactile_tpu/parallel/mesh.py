"""Device mesh and sharding helpers.

The reference is single-device (reference: Training/compare_dacvsproposal_3.py:39 —
``DEVICE = "cuda" if ... else "cpu"``; no torch.distributed anywhere). The TPU-native
framework scales via a 1-axis ``data`` mesh: batches are sharded over ICI, parameters
and VQ/EMA state are replicated, and XLA/GSPMD inserts the gradient ``psum``
collectives. Every workload goes through this module so the model code stays
mesh-agnostic. A ``model`` axis is reserved for tensor parallelism should model sizes
ever warrant it (~10M trainable params today — DP only).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, sharded on the leading axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_replicated(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_multiple(batch: Any, multiple: int) -> tuple[Any, int]:
    """Pad the leading axis so it divides the data-axis size; returns (batch, n_real)."""
    leaves = jax.tree.leaves(batch)
    if not leaves:
        return batch, 0
    n = leaves[0].shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return batch, n
    pad = lambda x: np.concatenate([x, np.repeat(x[-1:], rem, axis=0)], axis=0)
    return jax.tree.map(pad, batch), n
