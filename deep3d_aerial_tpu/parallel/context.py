"""Sharding context: lets model code place portable sharding constraints.

Model code calls `constrain(x, role)` at strategic points (e.g. the depth
axis of a cost volume). Outside any mesh context this is the identity; under
`use_mesh`, it applies `with_sharding_constraint` with the PartitionSpec
registered for that role, and XLA inserts the collectives (the
"annotate shardings, let XLA do the rest" recipe).

Roles used by the models:
  'depth_volume' — [..., D, H, W, C] cost volumes: shard D ('sp' axis). The
                   softmax over D then compiles to the psum-merged online
                   softmax across shards (same algebra as the streaming
                   accumulator in models/cascade.py).

Specs are anchored FROM THE RIGHT (role -> (dims_from_right, axis_name)):
model code runs under vmap for batching, which prepends batch dims; a
left-anchored PartitionSpec would land on the batch axis instead of the
depth axis (observed: 20x-wrong gradients under a dp x sp mesh).
"""

from __future__ import annotations

import contextlib
import threading
from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def active_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


def _specs() -> Dict[str, tuple]:
    return getattr(_state, "specs", {})


@contextlib.contextmanager
def use_mesh(mesh: Mesh, specs: Optional[Dict[str, tuple]] = None):
    """Activate a device mesh + role table for model tracing.

    specs: role -> (dims_from_right, axis_name); e.g. 'depth_volume' ->
    (4, 'sp') shards the dim 4 positions from the right ([D, H, W, C]).
    """
    if specs is None:
        specs = {}
        if "sp" in mesh.axis_names:
            specs["depth_volume"] = (4, "sp")
    prev_mesh = getattr(_state, "mesh", None)
    prev_specs = getattr(_state, "specs", {})
    _state.mesh = mesh
    _state.specs = specs
    try:
        yield
    finally:
        _state.mesh = prev_mesh
        _state.specs = prev_specs


def constrain(x, role: str):
    mesh = active_mesh()
    spec = _specs().get(role)
    if mesh is None or spec is None:
        return x
    dims_from_right, axis_name = spec
    if x.ndim < dims_from_right:
        return x
    parts = [None] * x.ndim
    parts[x.ndim - dims_from_right] = axis_name
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*parts))
    )
