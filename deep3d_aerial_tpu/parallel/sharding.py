"""Device-mesh construction and batch sharding helpers.

The multi-chip layout (SURVEY §2.10): ref-view batch -> 'dp' (one or more
depth maps per chip), depth-hypothesis axis -> 'sp' (cost-volume sharding
with psum-merged softmax), scene blocks -> hosts (process-level, DCN).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh with named axes, e.g. make_mesh({'dp': 4, 'sp': 2})."""
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(list(axes.values())))
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, only {len(devices)} present")
    arr = np.asarray(devices[:n]).reshape(tuple(axes.values()))
    return Mesh(arr, tuple(axes.keys()))


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place each array in a pytree with its leading dim sharded on `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
