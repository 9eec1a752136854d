"""Device meshes for sharded protocol reductions.

The reference's only parallel substrate is rayon threads chunking a vector
(inner_products/src/lib.rs:90-115).  The TPU-native analog is a 1-D
jax.sharding.Mesh over all chips: protocol vectors (points, scalars, Miller
values) are sharded on their element axis; reductions are per-device
partials plus one small collective over ICI (multiplicative all-reduce in
Fq12 for pairing products, additive EC all-reduce for MSM).  See SURVEY.md
section 5.7/5.8 for the mapping.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def data_mesh(devices: Optional[Sequence] = None,
              axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


def shard_spec(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 of every leaf across the mesh."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_tree(mesh: Mesh, tree):
    """Place a host/device pytree with axis 0 sharded across the mesh."""
    return jax.device_put(tree, shard_spec(mesh))
