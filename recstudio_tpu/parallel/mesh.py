"""Device mesh + sharding rules.

The reference's parallelism story is threaded DataParallel plus a dead NCCL/DDP
path (reference recommender.py:145-174, utils/data_parallel.py). The TPU-native
replacement is GSPMD: one ``jax.sharding.Mesh`` with a data axis (``dp``) and a
model axis (``mp``); batches are sharded over ``dp``, embedding tables are
row-sharded over ``mp``, dense towers replicated. XLA inserts the collectives
(all-to-all for sharded-table lookups, psum for gradient reduction) over
ICI/DCN — no NCCL, no process groups.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1, devices=None) -> Mesh:
    """Build a (dp, mp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // mp
    assert dp * mp == n, f"dp({dp}) * mp({mp}) must equal device count ({n})"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, axis_names=("dp", "mp"))


def _path_names(path):
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def _is_embedding_path(path) -> bool:
    names = _path_names(path)
    return bool(names) and "embedding" in names[-1].lower()


def _is_expert_bank_path(path) -> bool:
    # NAMING CONTRACT (see models/multitask/mmoe.py MMoENet): a flax module
    # named exactly 'experts' declares an expert-parallel bank — EVERY param
    # leaf under it must carry a leading expert axis (nn.vmap with
    # variable_axes={'params': 0}). Do not name a module 'experts' unless it
    # honors this; tests/test_multitask.py pins the contract for MMoE.
    return any(n == "experts" for n in _path_names(path))


def param_shardings(params, mesh: Mesh, shard_embeddings: bool = True):
    """Sharding tree: embedding tables row-sharded over 'mp', vmapped expert
    banks expert-sharded over 'mp' (expert parallelism — GSPMD turns the
    mixture-sum over experts into a psum across shards), rest replicated."""
    def rule(path, leaf):
        # jit input shardings must divide evenly: tables whose row count is
        # not a multiple of mp stay replicated (pad num_embeddings up to a
        # multiple of mp to shard them)
        if shard_embeddings and _is_embedding_path(path) and leaf.ndim >= 2 \
                and leaf.shape[0] % mesh.shape["mp"] == 0:
            return NamedSharding(mesh, P("mp", *([None] * (leaf.ndim - 1))))
        if _is_expert_bank_path(path) and leaf.ndim >= 1 \
                and leaf.shape[0] % mesh.shape["mp"] == 0:
            return NamedSharding(mesh, P("mp", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def batch_shardings(batch, mesh: Mesh):
    """Batch leaves sharded over 'dp' on the leading axis; scalars replicated."""
    def rule(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 \
                and leaf.shape[0] % mesh.shape["dp"] == 0:
            return NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(rule, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def shard_tree(tree, shardings):
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
