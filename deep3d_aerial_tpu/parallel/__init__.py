from .context import active_mesh, constrain, use_mesh
from .sharding import make_mesh, shard_batch
from .train_step import make_train_step

__all__ = [
    "active_mesh",
    "constrain",
    "use_mesh",
    "make_mesh",
    "shard_batch",
    "make_train_step",
]
