"""Sharding context: lets model code place portable sharding constraints.

Model code calls `constrain(x, role)` at strategic points (e.g. the depth
axis of a cost volume). Outside any mesh context this is the identity; under
`use_mesh`, it applies `with_sharding_constraint` with the PartitionSpec
registered for that role, and XLA inserts the collectives (the
"annotate shardings, let XLA do the rest" recipe).

Roles used by the models:
  'depth_shards' — [n, ...] depth-block arrays produced by the models'
                   blocked depth design (models/cascade.streaming_sweep
                   depth_shards / the volume models' blocked regularizers):
                   shard the leading block axis on 'sp'. The blocks are
                   computed independently and merged with the exact
                   online-softmax algebra, so there are NO cross-shard
                   halos — sharding a mid-CNN depth axis directly was
                   observed to MISCOMPILE (forward diff ~1e-3 in f64: the
                   XLA SPMD partitioner's halo handling of the 3-level
                   strided conv/deconv hourglass; see tests/test_parallel).

Specs: role -> (dims, axis_name). dims > 0 anchors FROM THE RIGHT
(x.ndim - dims): model code runs under vmap for batching, which prepends
batch dims; a left-anchored PartitionSpec would land on the batch axis
instead (observed: 20x-wrong gradients under a dp x sp mesh). dims <= 0
anchors from the LEFT at index -dims — used for 'depth_shards', whose
block axis is created inside the (spmd-aware) vmap body.
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
            specs["depth_shards"] = (0, "sp")
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
    dims, axis_name = spec
    idx = (x.ndim - dims) if dims > 0 else -dims
    if not (0 <= idx < x.ndim):
        return x
    parts = [None] * x.ndim
    parts[idx] = axis_name
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*parts))
    )
