"""Optimizers beyond the stock optax set.

``lazy_adam`` reproduces torch.optim.SparseAdam semantics (the optimizer the
reference exposes as ``learner: sparse_adam`` for large embedding tables):
Adam moments are updated ONLY for parameter rows actually touched by the step
(rows whose gradient is non-zero — with embedding lookups + segment-sum
gradients, exactly the rows referenced by the batch). Untouched rows keep
their moments and receive no update, so a 100M-row embedding table pays
per-step cost proportional to the touched rows' second-moment math instead of
decaying every row like dense Adam.

Bias correction uses the global step count (torch SparseAdam behavior).
For dense layers every row is touched each step, making lazy_adam identical
to Adam there.
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class LazyAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def lazy_update_leaf(g, mu, nu, count, learning_rate: float,
                     b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One lazy-Adam leaf update: returns ``(step, mu2, nu2)`` where
    ``step`` is the additive parameter delta. Rows (leading-dim slices)
    whose gradient is entirely zero are untouched (moments frozen, no
    step) — torch SparseAdam semantics. Shared by ``lazy_adam`` (dense
    execution) and the row-sparse engine paths so their trajectories are
    identical by construction."""
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    if g.ndim == 0:
        touched = (jnp.abs(g) > 0).astype(g.dtype)
    else:
        axes = tuple(range(1, g.ndim))
        touched = (jnp.abs(g) > 0).any(axes).astype(g.dtype) \
            .reshape((-1,) + (1,) * (g.ndim - 1))
    mu2 = mu + touched * ((1.0 - b1) * (g - mu))
    nu2 = nu + touched * ((1.0 - b2) * (g * g - nu))
    step = -learning_rate * touched * (mu2 / bc1) / (
        jnp.sqrt(nu2 / bc2) + eps)
    return step, mu2, nu2


def lazy_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p)
        return LazyAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1

        def upd(g, mu, nu):
            return lazy_update_leaf(g, mu, nu, count, learning_rate,
                                    b1, b2, eps)

        flat = jax.tree_util.tree_map(upd, grads, state.mu, state.nu)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree_util.tree_map(lambda t: t[1], flat,
                                    is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree_util.tree_map(lambda t: t[2], flat,
                                    is_leaf=lambda x: isinstance(x, tuple))
        return updates, LazyAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def row_lazy_adam(table: jax.Array, mu: jax.Array, nu: jax.Array,
                  ids: jax.Array, g: jax.Array, count: jax.Array,
                  learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                  eps: float = 1e-8):
    """Row-sparse lazy-Adam: the same update ``lazy_adam`` computes, applied
    by explicit row gather/scatter so per-step HBM traffic is O(K*D) for K
    touched rows instead of 5 full [N, D] round-trips (dense grad + mu/nu +
    params read/write). This is the scale wall for embedding training on
    TPU (docs/performance.md "Scale characteristics").

    ``ids [K]`` / ``g [K, D]``: per-lookup row gradients, duplicates allowed —
    they are segment-summed first, which is exactly the dense cotangent of a
    gather. Rows with id 0 ([PAD]) or an all-zero aggregated gradient are
    skipped, matching ``zero_pad_rows_in_grads`` + lazy_adam's ``touched``
    semantics, so the parameter trajectory is identical to the dense path.
    """
    K, N = ids.shape[0], table.shape[0]
    order = jnp.argsort(ids)
    sid = ids[order]
    sg = g[order]
    head = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(head) - 1                       # segment per sorted slot
    agg = jax.ops.segment_sum(sg, seg, num_segments=K)
    seg_ids = jax.ops.segment_max(sid, seg, num_segments=K)
    valid = ((jnp.arange(K) < head.sum()) & (seg_ids > 0)
             & jnp.any(jnp.abs(agg) > 0, axis=-1))
    read = jnp.where(valid, seg_ids, 0)
    mu_r = mu.at[read].get(mode="promise_in_bounds")
    nu_r = nu.at[read].get(mode="promise_in_bounds")
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    mu2 = mu_r + (1.0 - b1) * (agg - mu_r)
    nu2 = nu_r + (1.0 - b2) * (agg * agg - nu_r)
    step = -learning_rate * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
    w = jnp.where(valid, seg_ids, N)                 # OOB slots are dropped
    table = table.at[w].add(step.astype(table.dtype), mode="drop")
    mu = mu.at[w].set(mu2.astype(mu.dtype), mode="drop")
    nu = nu.at[w].set(nu2.astype(nu.dtype), mode="drop")
    return table, mu, nu


def _blocked_dedup(ids: jax.Array, g: jax.Array):
    """Aggregate duplicate lookups for pre-blocked ids ``[F, B]`` /
    ``g [F, B, D]`` where the F blocks index DISJOINT id ranges (the fused
    token table's per-field offset slabs): duplicates can then only occur
    within a block, so per-block sort + one global segment-sum is exactly
    the dense gather cotangent — and F row-wise sorts of B keys replace one
    F*B argsort (the round-3 lesson: a single 213k argsort inside the epoch
    scan costs more than the scatter it avoids; 8k-row batched sorts do
    not). Returns ``(ids [F*B], agg [F*B, D])``; slots that are not a
    segment head come back with id 0 and an all-zero row (callers treat
    both as "untouched")."""
    F, B = ids.shape
    K, D = F * B, g.shape[-1]
    order = jnp.argsort(ids, axis=-1)
    sid = jnp.take_along_axis(ids, order, axis=-1)
    sg = jnp.take_along_axis(g, order[..., None], axis=1)
    head = jnp.concatenate(
        [jnp.ones((F, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
    fh = head.reshape(-1)
    seg = jnp.cumsum(fh) - 1                 # globally contiguous segments
    agg = jax.ops.segment_sum(sg.reshape(K, D), seg, num_segments=K)
    seg_ids = jax.ops.segment_max(sid.reshape(-1), seg, num_segments=K)
    live = jnp.arange(K) < fh.sum()
    return jnp.where(live, seg_ids, 0), agg


def _fused_table_candidates(sizes: Sequence[int], ids2: jax.Array,
                            g: jax.Array, onehot_vocab_max: int
                            ) -> Tuple[jax.Array, jax.Array]:
    """Aggregate per-lookup gradients ``g [B, T, D]`` at offset ids
    ``ids2 [B, T]`` into candidate update rows ``(ids [K], agg [K, D])``:
    small-vocab fields exactly via one-hot MXU matmuls (every slab row a
    candidate), big-vocab fields deduped per field (``_blocked_dedup``).
    Slots with id 0 or an all-zero row are "untouched" to callers."""
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    id_parts, agg_parts = [], []
    for t, v in enumerate(sizes):
        if v > onehot_vocab_max:
            continue
        off = int(offs[t])
        rel = ids2[:, t] - off
        onehot = (rel[None, :] == jnp.arange(v, dtype=rel.dtype)[:, None])
        slab_g = jnp.dot(onehot.astype(g.dtype), g[:, t, :],
                         preferred_element_type=g.dtype,
                         precision=jax.lax.Precision.HIGHEST)
        id_parts.append(jnp.arange(off, off + v, dtype=jnp.int32))
        agg_parts.append(slab_g)
    big = [t for t, v in enumerate(sizes) if v > onehot_vocab_max]
    if big:
        bids = jnp.stack([ids2[:, t] for t in big], 0)          # [F, B]
        bg = jnp.stack([g[:, t, :] for t in big], 0)            # [F, B, D]
        ids_b, agg_b = _blocked_dedup(bids, bg)
        id_parts.append(ids_b)
        agg_parts.append(agg_b)
    return jnp.concatenate(id_parts), jnp.concatenate(agg_parts)


def unpack_table_params(packed: jax.Array) -> jax.Array:
    """First D columns of a packed [N, 3D] buffer (the parameters)."""
    d = packed.shape[-1] // 3
    return packed[:, :d]


def fused_table_lazy_adam_packed(sizes: Sequence[int], packed: jax.Array,
                                 ids2: jax.Array, g: jax.Array,
                                 count: jax.Array, learning_rate: float,
                                 b1: float = 0.9, b2: float = 0.999,
                                 eps: float = 1e-8,
                                 onehot_vocab_max: int = 1024) -> jax.Array:
    """``fused_table_lazy_adam`` on a PACKED [N, 3D] buffer holding
    (params | mu | nu) per row — ONE gather and ONE scatter instead of one
    gather + three scatters. Motivation (scripts/sparse_bisect.py +
    scatter microbench, real chip 2026-08-20): TPU row-scatter cost is
    per-ROW and width-independent below 128 lanes (74k-row scatter: 8.8 ms
    at D=10, 10.6 ms at D=30, donated buffers), so three [K, D] scatters
    cost ~24 ms where one [K, 3D] scatter costs ~10 — the difference is
    the entire gap by which sparse_adam lost to dense Adam in BENCH_r04.
    Same trajectory as ``lazy_adam`` (tests/test_sparse_rows.py)."""
    D = g.shape[-1]
    N = packed.shape[0]
    ids, agg = _fused_table_candidates(sizes, ids2, g, onehot_vocab_max)
    valid = (ids > 0) & jnp.any(jnp.abs(agg) > 0, axis=-1)
    read = jnp.where(valid, ids, 0)
    rows = packed.at[read].get(mode="promise_in_bounds")    # [K, 3D]
    p_r, mu_r, nu_r = rows[:, :D], rows[:, D:2 * D], rows[:, 2 * D:]
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    mu2 = mu_r + (1.0 - b1) * (agg - mu_r)
    nu2 = nu_r + (1.0 - b2) * (agg * agg - nu_r)
    step = -learning_rate * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
    new_rows = jnp.concatenate([p_r + step, mu2, nu2], axis=-1)
    w = jnp.where(valid, ids, N)             # OOB slots are dropped
    return packed.at[w].set(new_rows.astype(packed.dtype), mode="drop")


def fused_table_lazy_adam(sizes: Sequence[int], table: jax.Array,
                          mu: jax.Array, nu: jax.Array, ids2: jax.Array,
                          g: jax.Array, count: jax.Array,
                          learning_rate: float, b1: float = 0.9,
                          b2: float = 0.999, eps: float = 1e-8,
                          onehot_vocab_max: int = 1024
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Row-sparse lazy-Adam for the fused multi-field token table
    (models/module/ctr.py ``Embeddings``): per-LOOKUP gradients
    ``g [B, T, D]`` for offset ids ``ids2 [B, T]`` arrive from the probe
    trick (baseranker.py ``_ctr_sparse_grad_step``) instead of a dense
    [N, D] cotangent. Candidate update rows split by the same vocab cutoff
    as ``_fused_gather``'s backward:

    - small-vocab fields aggregate EXACTLY via a one-hot MXU matmul (every
      slab row is a candidate, ~1.5k rows total at criteo shape);
    - big-vocab fields dedup per field (slabs are disjoint — see
      ``_blocked_dedup``), contributing B candidates per field;

    then ONE gather reads the candidates' moments and ONE scatter per
    buffer (params add, mu/nu set) applies the update — no chained
    per-slab dynamic_update_slices on the [N, D] buffers (a 51-deep DUS
    chain risks unaliased full-table temporaries inside the epoch scan).
    Rows with id 0 (the global [PAD] row, zero_pad_rows_in_grads
    semantics) or an all-zero aggregated gradient are untouched, matching
    dense ``lazy_adam``. Per-step HBM traffic is O((B*F_big + V_small)*D)
    instead of dense Adam's 5+ full [N, D] round-trips — the scale wall
    the reference hits with torch.optim's dense updates
    (recstudio/model/basemodel/recommender.py:594-648). Trajectory parity
    with the dense path is tested in tests/test_sparse_rows.py.
    """
    D = table.shape[-1]
    N = table.shape[0]
    ids, agg = _fused_table_candidates(sizes, ids2, g, onehot_vocab_max)
    valid = (ids > 0) & jnp.any(jnp.abs(agg) > 0, axis=-1)
    read = jnp.where(valid, ids, 0)
    mu_r = mu.at[read].get(mode="promise_in_bounds")
    nu_r = nu.at[read].get(mode="promise_in_bounds")
    cf = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** cf
    bc2 = 1.0 - b2 ** cf
    mu2 = mu_r + (1.0 - b1) * (agg - mu_r)
    nu2 = nu_r + (1.0 - b2) * (agg * agg - nu_r)
    step = -learning_rate * (mu2 / bc1) / (jnp.sqrt(nu2 / bc2) + eps)
    w = jnp.where(valid, ids, N)             # OOB slots are dropped
    table = table.at[w].add(step.astype(table.dtype), mode="drop")
    mu = mu.at[w].set(mu2.astype(mu.dtype), mode="drop")
    nu = nu.at[w].set(nu2.astype(nu.dtype), mode="drop")
    return table, mu, nu
