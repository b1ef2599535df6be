from . import launch
from .mesh import (batch_shardings, make_mesh, param_shardings, replicated,
                   shard_tree)

__all__ = ["make_mesh", "param_shardings", "batch_shardings", "replicated",
           "shard_tree", "launch"]
