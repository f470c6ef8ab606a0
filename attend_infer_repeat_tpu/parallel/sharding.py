"""Mesh construction and sharding helpers (data-parallel over ICI).

Design (scaling-book recipe): pick a mesh, annotate shardings on the
inputs/outputs, let XLA's GSPMD partitioner insert the collectives.  For
AIR's size the right layout is pure DP — parameters and optimizer state
replicated, the image batch (and everything downstream of it) sharded on
the ``data`` axis; the gradient all-reduce XLA inserts rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over the data axis.

    ``n_devices=None`` uses every visible device.  With one device this
    degenerates gracefully (shardings become no-ops), so the same train
    step serves 1-chip and pod runs.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int = 3,
                   axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params / optimizer state / scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = DATA_AXIS):
    """Device-put a pytree of batched arrays with axis 0 sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, np.ndim(x), axis_name)), tree)


def constrain_batch(x, mesh: Optional[Mesh],
                    axis_name: str = DATA_AXIS):
    """Inside-jit sharding constraint pinning axis 0 to the data axis.

    No-op when ``mesh`` is None (single-device path compiles unchanged).
    """
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, batch_sharding(mesh, x.ndim, axis_name))
