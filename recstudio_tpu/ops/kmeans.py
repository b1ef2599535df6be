"""On-device k-means for model-based samplers (MIDX/cluster/intent-CL).

Replaces the reference's tensor k-means (recstudio/ann/sampler.py:9-35) and its
faiss.Kmeans uses (module/data_augmentation.py:465,628). Pure JAX: fixed
iteration count under ``lax.fori_loop`` (static shapes, MXU-friendly distance
matmuls), dead clusters re-seeded from random points each round.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(2, 3))
def kmeans(rng: jax.Array, x: jax.Array, k: int, max_iter: int = 30
           ) -> Tuple[jax.Array, jax.Array]:
    """Cluster ``x [N, D]`` into ``k`` centroids.

    Returns ``(centers [K, D], assign [N])``.
    """
    n = x.shape[0]
    init_key, loop_key = jax.random.split(rng)
    init_idx = jax.random.permutation(init_key, n)[:k]
    centers = x[init_idx]

    def assign_step(c):
        # squared euclidean distances via the matmul identity (MXU path)
        d = (jnp.sum(x * x, -1, keepdims=True) - 2.0 * (x @ c.T)
             + jnp.sum(c * c, -1)[None, :])
        return jnp.argmin(d, axis=-1)

    def body(i, carry):
        centers, _ = carry
        assign = assign_step(centers)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)          # [N, K]
        counts = one_hot.sum(0)                                      # [K]
        sums = one_hot.T @ x                                         # [K, D]
        new_centers = sums / jnp.maximum(counts, 1.0)[:, None]
        # reseed empty clusters from (pseudo)random points
        reseed_idx = jax.random.randint(jax.random.fold_in(loop_key, i), (k,), 0, n)
        empty = counts < 0.5
        new_centers = jnp.where(empty[:, None], x[reseed_idx], new_centers)
        return new_centers, assign

    centers, assign = jax.lax.fori_loop(
        0, max_iter, body, (centers, jnp.zeros(n, dtype=jnp.int32)))
    assign = assign_step(centers)
    return centers, assign


def construct_index(assign: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """CSR-style inverted index: item ids sorted by cluster + cluster offsets.

    Returns ``(indices [N], indptr [K+1])`` (reference ann/sampler.py:38-45).
    """
    order = jnp.argsort(assign, stable=True)
    counts = jnp.bincount(assign, length=k)
    indptr = jnp.concatenate([jnp.zeros(1, dtype=jnp.int32),
                              jnp.cumsum(counts).astype(jnp.int32)])
    return order.astype(jnp.int32), indptr
