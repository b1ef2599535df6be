"""IVF approximate MIPS index (``train.ann: ivf``).

The reference advertises approximate ANN via faiss (``train.ann: IVFx,Flat``,
reference model/basemodel/basemodel.yaml:34-35) but the path is latently
broken — ``build_ann_index`` is called yet defined nowhere (reference
baseretriever.py:140). This is the working TPU-native version:

- coarse quantizer: on-device k-means over the item vectors (ops/kmeans.py);
- inverted lists with FIXED capacity per cluster (static shapes — XLA needs
  them; overflowing items spill into the residual tail of OTHER lists'
  unused slots is not attempted: they are simply kept in a shared overflow
  list that is always probed, so no item is ever unreachable);
- query: score the K centroids on the MXU, take the top-``nprobe`` clusters,
  gather + score only their candidates.

Exact full-catalog search stays the default (`train.ann: ~`); IVF is for
multi-million-item catalogs where the dense [B, N] scoring dominates.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_ivf(rng: jax.Array, item_vectors: jax.Array,
              num_clusters: Optional[int] = None, cap_factor: float = 2.0,
              kmeans_iter: int = 10) -> Dict[str, jax.Array]:
    """Build the index over ``item_vectors [N, D]`` (row r = item id r+1).

    Returns a pytree: centroids [K, D], fixed-capacity inverted lists
    [K, cap] of 0-based rows (sentinel N = empty slot), and a shared
    overflow list [cap_ov] holding items whose home cluster was full.
    """
    from ..ops.kmeans import kmeans
    N = int(item_vectors.shape[0])
    K = int(num_clusters or max(int(np.sqrt(N)), 8))
    cap = max(8, int(cap_factor * N / K))
    centers, assign = kmeans(rng, item_vectors, K, max_iter=kmeans_iter)

    order = jnp.argsort(assign)
    a_sorted = assign[order]
    pos = jnp.arange(N) - jnp.searchsorted(a_sorted, a_sorted, side="left")
    ok = pos < cap
    ci = jnp.where(ok, a_sorted, K).astype(jnp.int32)
    pi = jnp.where(ok, pos, 0).astype(jnp.int32)
    lists = jnp.full((K, cap), N, jnp.int32).at[ci, pi].set(
        order.astype(jnp.int32), mode="drop")

    # overflow list: items that did not fit their home cluster (always
    # probed, so no item is ever unreachable). Build runs on the host side
    # of the epoch refresh, so the list is sized exactly.
    ok_np = np.asarray(ok)
    n_ov = int((~ok_np).sum())
    cap_ov = max(8, -(-n_ov // 8) * 8)
    ov_pos = (jnp.cumsum(~ok) - 1).astype(jnp.int32)
    ov_i = jnp.where(~ok, ov_pos, cap_ov)
    overflow = jnp.full((cap_ov,), N, jnp.int32).at[ov_i].set(
        order.astype(jnp.int32), mode="drop")
    return {"centers": centers, "lists": lists, "overflow": overflow}


@partial(jax.jit, static_argnums=(3, 4))
def ivf_search(index: Dict[str, jax.Array], item_vectors: jax.Array,
               query: jax.Array, k: int, nprobe: int,
               user_hist: Optional[jax.Array] = None
               ) -> Tuple[jax.Array, jax.Array]:
    """Approximate top-k MIPS. ``query [B, D]`` -> (values [B, k],
    item ids [B, k], 1-based). History ids in ``user_hist`` (1-based,
    0 = pad) are excluded."""
    centers, lists = index["centers"], index["lists"]
    N = item_vectors.shape[0]
    B = query.shape[0]
    K, cap = lists.shape

    cscore = query @ centers.T                                 # [B, K]
    _, cidx = jax.lax.top_k(cscore, min(nprobe, K))            # [B, nprobe]
    cand = lists[cidx].reshape(B, -1)                          # [B, nprobe*cap]
    cand = jnp.concatenate(
        [cand, jnp.broadcast_to(index["overflow"][None], (B, index["overflow"].shape[0]))],
        axis=1)                                                # [B, C]
    valid = cand < N
    vecs = item_vectors[jnp.minimum(cand, N - 1)]              # [B, C, D]
    s = jnp.einsum("bd,bcd->bc", query, vecs)
    s = jnp.where(valid, s, -jnp.inf)

    if user_hist is not None:
        hist_sorted = jnp.sort(user_hist.astype(jnp.int32), axis=1)   # [B, H]
        ids = cand + 1
        loc = jax.vmap(jnp.searchsorted)(hist_sorted, ids)
        hit = jnp.take_along_axis(
            jnp.pad(hist_sorted, ((0, 0), (0, 1))), loc, axis=1) == ids
        s = jnp.where(hit, -jnp.inf, s)

    v, sel = jax.lax.top_k(s, k)
    return v, jnp.take_along_axis(cand, sel, axis=-1) + 1
