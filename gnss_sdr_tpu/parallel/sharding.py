"""Mesh and sharding helpers for the channel-parallel receiver."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CHANNEL_AXIS = "ch"


def make_mesh(n_devices: int | None = None, axis: str = CHANNEL_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def channel_sharding(mesh: Mesh, axis: str = CHANNEL_AXIS) -> NamedSharding:
    """Shard leading (channel) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_tracking_state(state, mesh: Mesh):
    """Place every TrackState leaf with its channel axis sharded."""
    sh = channel_sharding(mesh)
    return jax.tree.map(lambda leaf: jax.device_put(leaf, sh), state)
