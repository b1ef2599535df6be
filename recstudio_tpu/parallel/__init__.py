from . import launch
from .embedding import a2a_dedup_lookup, pad_vocab, sharded_lookup
from .mesh import (batch_shardings, make_mesh, param_shardings, replicated,
                   shard_tree)

__all__ = ["make_mesh", "param_shardings", "batch_shardings", "replicated",
           "shard_tree", "launch", "sharded_lookup", "a2a_dedup_lookup",
           "pad_vocab"]
