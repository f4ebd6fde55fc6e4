"""Device mesh construction for ray-data-parallel execution.

The reference's only parallelism is single-host nn.DataParallel over rays
(SURVEY.md §2.6). The TPU-native equivalent: shard the rays axis of every
batch over a 1-D `jax.sharding.Mesh` ("data"); the point cloud, grid, and MLP
parameters replicate; XLA inserts psum over ICI for the gradient all-reduce.
The point grid could additionally shard by spatial slab ("model" axis) if it
outgrew HBM — not needed at reference scale (<1 GB of point data).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def ray_sharding(mesh: Mesh, ray_axis: int = 1) -> NamedSharding:
    """Shard axis `ray_axis` (default: the R axis of (B,R,...) tensors)."""
    spec = [None] * (ray_axis + 1)
    spec[ray_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
