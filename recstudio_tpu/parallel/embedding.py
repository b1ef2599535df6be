"""Row-sharded embedding tables with collective lookup.

The recsys analog of tensor parallelism (BASELINE north star): user/item
tables are row-sharded across the `mp` mesh axis; lookups exchange ids via
`all_gather` (small) and combine partial results with `psum` — both riding ICI.
The backward pass is automatic: `shard_map` differentiates through the
collectives, producing scatter-add gradients into the local shard only.

Two lookup strategies, selected by ``train.embedding_lookup``:
- ``gspmd`` (default, implicit): tables carry a ``P('mp', None)`` sharding
  and XLA lowers the plain gather to its own collective schedule.
- ``a2a``: :func:`a2a_dedup_lookup` under ``shard_map`` — comm volume scales
  with UNIQUE ids, not mp*B*D. The engine activates it via
  :func:`set_a2a_lookup`; ``models.module.Embedding`` consults
  :func:`a2a_lookup_mesh` at trace time and routes its table read through
  :func:`mp_table_lookup`.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Active a2a-lookup mesh, set by the engine (Recommender._init_parameter)
# when `train.embedding_lookup: a2a` and the mesh has mp > 1. Read by
# models.module.Embedding at TRACE time. A plain global is safe here because
# it only selects between two numerically identical lookup strategies — a
# stale value can change a later trace's comm schedule, never its result.
_A2A_MESH: Optional[Mesh] = None


def set_a2a_lookup(mesh: Optional[Mesh]) -> None:
    """Enable (mesh) or disable (None) the all-to-all dedup lookup route."""
    global _A2A_MESH
    _A2A_MESH = mesh


def a2a_lookup_mesh() -> Optional[Mesh]:
    return _A2A_MESH


def mp_table_lookup(mesh: Mesh, table: jax.Array, ids: jax.Array) -> jax.Array:
    """Route a row-sharded-table read through :func:`a2a_dedup_lookup`.

    Manual over the ``mp`` axis only (``axis_names={'mp'}``): the table
    enters as its local [rows/mp, D] shard, ids stay replicated over mp, and
    the ``dp`` axis remains GSPMD-auto so dp-sharded batches keep their
    layout. Differentiable in ``table`` (the all_to_all pair transposes to
    the reverse exchange + scatter-add into the local shard)."""
    return jax.shard_map(
        lambda t, i: a2a_dedup_lookup(t, i, "mp"),
        mesh=mesh, in_specs=(P("mp", None), P()), out_specs=P(),
        axis_names=frozenset({"mp"}), check_vma=False)(table, ids)


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


def _round8(x: int) -> int:
    return max(8, -(-x // 8) * 8)


def a2a_dedup_lookup(table: jax.Array, ids: jax.Array, axis_name: str = "mp",
                     cap_factor: float = 2.0, return_stats: bool = False):
    """Row-sharded lookup whose comm volume scales with UNIQUE ids, not
    mp*B*D (SURVEY §2.8's all-to-all id-exchange design; the scalable
    alternative to :func:`sharded_lookup`'s psum-of-dense-partials).

    Inside shard_map over ``axis_name``: ``table`` is the local shard
    [rows, D] of a contiguously row-sharded table; ``ids`` are replicated
    global ids. Steps:

    1. deduplicate ids locally (sort + first-occurrence compaction — static
       shapes, capacity B);
    2. pack the unique ids by owning shard into [mp, C] request containers,
       C = cap_factor*B/mp, and exchange them with ``all_to_all`` (int32 —
       64x cheaper than embedding rows at D=64);
    3. each shard gathers its owned rows and a second ``all_to_all`` returns
       exactly the requested embeddings [mp, C, D];
    4. scatter into unique slots and expand through the inverse indices.

    Exact for ANY input: if a skewed batch overflows a destination's request
    capacity, a replicated ``cond`` engages a SECOND exchange round at full
    capacity for just the overflowed uniques — the extra comm is paid only
    when overflow actually happens (never, for well-spread ids at
    cap_factor 2). Differentiable in ``table`` (all_to_all/scatter transpose
    to the reverse exchange + scatter-add into the local shard).

    Note: the result is replicated in value across ``axis_name`` but derived
    through shard-varying data, so shard_map's static replication check
    cannot prove it — call under ``jax.shard_map(..., check_vma=False)``.
    """
    mp = jax.lax.psum(1, axis_name)  # static axis size
    shard = jax.lax.axis_index(axis_name)
    rows, D = table.shape
    flat = ids.reshape(-1).astype(jnp.int32)
    B = flat.shape[0]
    U = B  # unique capacity

    # 1. dedup (static shapes)
    order = jnp.argsort(flat)
    s = flat[order]
    first = jnp.concatenate([jnp.ones((1,), bool), s[1:] != s[:-1]])
    slot_sorted = (jnp.cumsum(first) - 1).astype(jnp.int32)
    n_uniq = first.sum()
    uniq = jnp.zeros((U,), jnp.int32).at[slot_sorted].set(s)
    inv = jnp.zeros((B,), jnp.int32).at[order].set(slot_sorted)

    valid_u = jnp.arange(U) < n_uniq
    dest = jnp.where(valid_u, uniq // rows, mp)      # mp = drop sentinel
    lo = shard * rows

    def exchange_round(sel_mask, capacity):
        """Pack uniques under ``sel_mask`` into [mp, capacity] containers,
        exchange ids, serve owned rows, exchange embeddings back, scatter
        into unique slots. Returns ([U, D] partials, overflow mask)."""
        dest_r = jnp.where(sel_mask, dest, mp)
        d_order = jnp.argsort(dest_r)
        d_sorted = dest_r[d_order]
        pos = jnp.arange(U) - jnp.searchsorted(d_sorted, d_sorted, side="left")
        ok = (pos < capacity) & (d_sorted < mp)
        di = jnp.where(ok, d_sorted, mp).astype(jnp.int32)
        pi = jnp.where(ok, pos, 0).astype(jnp.int32)
        reqs = jnp.zeros((mp, capacity), jnp.int32).at[di, pi].set(
            uniq[d_order], mode="drop")
        slot_of = jnp.full((mp, capacity), U, jnp.int32).at[di, pi].set(
            d_order.astype(jnp.int32), mode="drop")

        got = jax.lax.all_to_all(reqs, axis_name, split_axis=0, concat_axis=0)
        local = got - lo
        owned = (local >= 0) & (local < rows)
        vals = jnp.where(owned[..., None],
                         table[jnp.clip(local, 0, rows - 1)], 0.0)
        resp = jax.lax.all_to_all(vals, axis_name, split_axis=0, concat_axis=0)

        part = jnp.zeros((U, D), table.dtype).at[slot_of.reshape(-1)].set(
            resp.reshape(-1, D), mode="drop")
        ov = jnp.zeros((U,), bool).at[d_order].set((~ok) & (d_sorted < mp))
        return part, ov

    C = min(_round8(int(cap_factor * B / mp)), B)
    uniq_emb, ov_mask = exchange_round(valid_u, C)
    n_over = ov_mask.sum()
    any_over = jax.lax.psum(n_over, axis_name) > 0

    # exact overflow fallback: second round at full capacity (U per
    # destination can never overflow), engaged only when needed
    uniq_emb = uniq_emb + jax.lax.cond(
        any_over,
        lambda: exchange_round(ov_mask, U)[0],
        lambda: jnp.zeros_like(uniq_emb))  # zeros_like keeps the vma type

    out = uniq_emb[inv].reshape(*ids.shape, D)
    if return_stats:
        return out, {"n_unique": n_uniq, "n_overflow": n_over, "capacity": C}
    return out


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
