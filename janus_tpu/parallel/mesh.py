"""Mesh construction and batch-axis sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a device mesh. Default: 1-D 'data' mesh over all devices.

    For 2-D (data, model) pass axes=("data","model") and a shape, or let it
    default to putting all devices on 'data'.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """NamedSharding that splits the LEADING (trajectory) axis only."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a pytree of [M, ...] arrays with the batch axis sharded."""
    def place(a):
        a = jnp.asarray(a)
        return jax.device_put(a, batch_sharding(mesh, a.ndim, axis))
    return jax.tree_util.tree_map(place, x)


def replicate(x, mesh: Mesh):
    """Fully replicate a pytree over the mesh."""
    def place(a):
        a = jnp.asarray(a)
        return jax.device_put(a, NamedSharding(mesh, P()))
    return jax.tree_util.tree_map(place, x)
