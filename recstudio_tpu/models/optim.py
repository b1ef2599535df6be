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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LazyAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


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
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def upd(g, mu, nu):
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
