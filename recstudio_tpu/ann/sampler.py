"""Negative sampler zoo — fully on-device, stateless-PRNG JAX samplers.

Re-design of the reference sampler subsystem (recstudio/ann/sampler.py) for
XLA: every sampler is a pair of pure functions

- ``update(rng, item_embs) -> state``: (re)builds the sampler's index
  structures (k-means codebooks, CSR inverted indices, popularity CDFs, LSH
  tables) as a pytree of device arrays with **static shapes**. Called once per
  epoch by the engine (reference recommender.py:564-570).
- ``__call__(state, rng, query, num_neg, pos_items, user_hist) ->
  (log_pos_prob, neg_ids, log_neg_prob)``: jit-safe sampling with the
  importance-correction contract shared with the loss library.

Proposal families (and their reference anchors):
UniformSampler (:81), MaskedUniformSampler (:187, searchsorted shift trick),
PopularSamplerModel (:224, inverse-CDF), MIDXSamplerUniform/Pop (:261/:391,
FastVAE quantization sampler), ClusterSamplerUniform/Pop (:426/:533, PRIS),
LSHSampler (:562, SimHash with collision-probability correction),
RetrieverSampler (:61, adversarial sampling for IRGAN).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kmeans import construct_index, kmeans

Array = jax.Array
EPS = 1e-12


def _num_queries_shape(query):
    return query.shape[:-1]


def _categorical(rng: Array, logits: Array, num: int) -> Array:
    """Sample ``num`` class ids with replacement from ``logits [..., K]``."""
    out = jax.random.categorical(rng, logits, axis=-1, shape=(num, *logits.shape[:-1]))
    return jnp.moveaxis(out, 0, -1)  # [..., num]


def _bisect(cdf: Array, lo: Array, hi: Array, u: Array, iters: int = 32) -> Array:
    """Vectorized lower-bound binary search of ``u`` in ``cdf[lo..hi]``."""
    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        go_right = cdf[mid] < u
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)
    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


class Sampler:
    """Base sampler. ``num_items`` includes the [PAD] slot (index 0)."""

    def __init__(self, num_items: int, scorer_fn=None):
        self.num_items = num_items - 1  # real items live in [1, num_items-1]
        self.scorer = scorer_fn

    def update(self, rng: Array, item_embs: Array):
        return ()

    def compute_item_p(self, state, query, items) -> Array:
        return jnp.zeros(items.shape, dtype=jnp.float32)

    def __call__(self, state, rng, query, num_neg: int,
                 pos_items: Optional[Array] = None, user_hist: Optional[Array] = None):
        raise NotImplementedError


class UniformSampler(Sampler):
    """Uniform ids over [1, num_items]; proposal log-prob identically 0."""

    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None):
        shape = _num_queries_shape(query) if hasattr(query, "shape") else (query,)
        neg_items = jax.random.randint(rng, (*shape, num_neg), 1, self.num_items + 1)
        neg_prob = self.compute_item_p(state, query, neg_items)
        if pos_items is not None:
            pos_prob = self.compute_item_p(state, query, pos_items)
            return pos_prob, neg_items, neg_prob
        return neg_items, neg_prob


class MaskedUniformSampler(Sampler):
    """Uniform over non-history items via the sorted-shift trick
    (reference ann/sampler.py:117-147): draw u in [1, n_free], then shift past
    the user's sorted history with a right-searchsorted."""

    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None):
        assert user_hist is not None, "MaskedUniformSampler requires user_hist"
        qshape = _num_queries_shape(query)
        bsz, hist_len = user_hist.shape
        n_draw = int(np.prod(qshape[1:], initial=1)) * num_neg
        u = jax.random.uniform(rng, (bsz, n_draw))
        nonzero = jnp.count_nonzero(user_hist, axis=-1)               # [B]
        neg = jnp.floor(u * (self.num_items - nonzero)[:, None]).astype(jnp.int32) + 1
        sorted_hist = jnp.sort(user_hist, axis=-1)
        # compress the zero padding out of the sorted order
        offset = jnp.arange(hist_len)[None, :] - (hist_len - nonzero)[:, None]
        offset = jnp.maximum(offset, 0)
        sorted_hist = sorted_hist - offset
        shift = jax.vmap(lambda h, n: jnp.searchsorted(h, n, side="right"))(sorted_hist, neg)
        neg = neg + (shift - (hist_len - nonzero)[:, None])
        neg_items = neg.reshape(*qshape, num_neg)
        neg_prob = self.compute_item_p(state, query, neg_items)
        if pos_items is not None:
            return self.compute_item_p(state, query, pos_items), neg_items, neg_prob
        return neg_items, neg_prob


class PopularSamplerModel(Sampler):
    """Popularity-proportional sampling by inverse-CDF (searchsorted)."""

    def __init__(self, pop_count: np.ndarray, scorer_fn=None, mode: int = 0):
        super().__init__(pop_count.shape[0], scorer_fn)
        pop = jnp.asarray(pop_count, dtype=jnp.float32)
        if mode == 0:
            pop = jnp.log(pop + 1.0)
        elif mode == 1:
            pop = jnp.log(pop + 1.0) + 1e-6
        elif mode == 2:
            pop = pop ** 0.75
        pop = pop.at[0].set(1.0)  # keep [PAD] mass tiny but nonzero (log-safe)
        prob = pop / pop.sum()
        table = jnp.cumsum(prob)
        self._static_state = {"pop_prob": prob.at[-1].set(1.0), "table": table}

    def update(self, rng, item_embs):
        return self._static_state

    def compute_item_p(self, state, query, items):
        return jnp.log(state["pop_prob"][items])

    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None):
        qshape = _num_queries_shape(query)
        seeds = jax.random.uniform(rng, (*qshape, num_neg))
        neg_items = jnp.searchsorted(state["table"], seeds.reshape(-1)).reshape(seeds.shape)
        neg_prob = self.compute_item_p(state, query, neg_items)
        if pos_items is not None:
            return self.compute_item_p(state, query, pos_items), neg_items, neg_prob
        return neg_items, neg_prob


# ---------------------------------------------------------------------------
# quantization-based dynamic samplers
# ---------------------------------------------------------------------------
class MIDXSamplerUniform(Sampler):
    """MIDX (FastVAE) sampler: two half-space codebooks; sample a cluster pair
    (k0, k1) from query-conditioned softmax logits, then an item inside the
    (k0, k1) bucket; exact proposal log-prob for correction."""

    def __init__(self, num_items: int, num_clusters: int, scorer_fn=None):
        super().__init__(num_items, scorer_fn)
        self.K = num_clusters

    # ---- index building ---------------------------------------------------
    def update(self, rng, item_embs: Array, max_iter: int = 30):
        from ..models.scorer import CosineScorer, EuclideanScorer
        if isinstance(self.scorer, CosineScorer):
            item_embs = item_embs / (jnp.linalg.norm(item_embs, axis=-1, keepdims=True) + EPS)
        r0key, r1key = jax.random.split(rng)
        half = item_embs.shape[-1] // 2
        embs1, embs2 = item_embs[:, :half], item_embs[:, half:]
        c0, cd0 = kmeans(r0key, embs1, self.K, max_iter)
        c1, cd1 = kmeans(r1key, embs2, self.K, max_iter)
        state = {
            "c0": c0, "c1": c1,
            # padded codebooks/assignments so that item id indexing (PAD=0) works
            "c0_": jnp.concatenate([jnp.zeros((1, c0.shape[1]), c0.dtype), c0]),
            "c1_": jnp.concatenate([jnp.zeros((1, c1.shape[1]), c1.dtype), c1]),
            "cd0": jnp.concatenate([-jnp.ones(1, cd0.dtype), cd0]) + 1,
            "cd1": jnp.concatenate([-jnp.ones(1, cd1.dtype), cd1]) + 1,
        }
        cd01 = cd0 * self.K + cd1
        indices, indptr = construct_index(cd01, self.K ** 2)
        state["indices"], state["indptr"] = indices, indptr
        m0 = jax.nn.one_hot(cd0, self.K, dtype=item_embs.dtype)
        m1 = jax.nn.one_hot(cd1, self.K, dtype=item_embs.dtype)
        self._update(state, item_embs, m0, m1)
        return state

    def _update(self, state, item_embs, m0, m1):
        from ..models.scorer import EuclideanScorer
        if not isinstance(self.scorer, EuclideanScorer):
            state["wkk"] = m0.T @ m1
        else:
            norm = jnp.exp(-0.5 * jnp.sum(item_embs ** 2, axis=-1))
            state["wkk"] = m0.T @ (m1 * norm[:, None])
            self._attach_pop_cdf(state, norm)

    def _attach_pop_cdf(self, state, norm):
        """Per-bucket normalized cumulative weights over `indices` order."""
        indices, indptr = state["indices"], state["indptr"]
        w = norm[indices]
        csum = jnp.cumsum(w)
        bucket_of = jnp.searchsorted(indptr, jnp.arange(len(indices)), side="right") - 1
        start_csum = jnp.concatenate([jnp.zeros(1, csum.dtype), csum])[indptr[bucket_of]]
        end_csum = jnp.concatenate([jnp.zeros(1, csum.dtype), csum])[indptr[bucket_of + 1]]
        denom = jnp.maximum(end_csum - start_csum, EPS)
        state["cp"] = (csum - start_csum) / denom
        state["p"] = jnp.concatenate([jnp.ones(1, norm.dtype), norm])

    # ---- sampling -----------------------------------------------------------
    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None):
        from ..models.scorer import CosineScorer
        if isinstance(self.scorer, CosineScorer):
            query = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + EPS)
        qshape = _num_queries_shape(query)
        q = query.reshape(-1, query.shape[-1])
        half = q.shape[-1] // 2
        q0, q1 = q[:, :half], q[:, half:]
        r1 = q1 @ state["c1"].T
        r1s = jax.nn.softmax(r1, axis=-1)
        r0 = q0 @ state["c0"].T
        r0s = jax.nn.softmax(r0, axis=-1)
        s0 = (r1s @ state["wkk"].T) * r0s                               # [Q, K0]
        k0key, k1key, ikey = jax.random.split(rng, 3)
        k0 = _categorical(k0key, jnp.log(s0 + EPS), num_neg)            # [Q, neg]
        p0 = jnp.take_along_axis(r0, k0, axis=-1)
        subwkk = state["wkk"][k0]                                        # [Q, neg, K1]
        s1 = subwkk * r1s[:, None, :]
        k1 = _categorical(k1key, jnp.log(s1 + EPS), 1).squeeze(-1)      # [Q, neg]
        p1 = jnp.take_along_axis(r1, k1, axis=-1)
        k01 = k0 * self.K + k1
        p01 = p0 + p1
        neg_items, neg_prob = self._sample_in_bucket(state, ikey, k01, p01)
        neg_items = neg_items.reshape(*qshape, num_neg)
        neg_prob = neg_prob.reshape(*qshape, num_neg)
        if pos_items is not None:
            pos_prob = self.compute_item_p(state, query, pos_items)
            return pos_prob, neg_items, neg_prob
        return neg_items, neg_prob

    def _sample_in_bucket(self, state, rng, k01, p01):
        indices, indptr = state["indices"], state["indptr"]
        if "cp" not in state:
            cnt = (indptr[k01 + 1] - indptr[k01]).astype(jnp.float32)
            u = jax.random.uniform(rng, k01.shape)
            item_idx = jnp.floor(cnt * u).astype(jnp.int32)
            # guard empty buckets: clamp into valid range
            item_idx = jnp.minimum(item_idx, jnp.maximum(cnt.astype(jnp.int32) - 1, 0))
            neg_items = indices[item_idx + indptr[k01]] + 1
            return neg_items, p01
        # popularity-weighted within the bucket: bisect the normalized CDF
        start = indptr[k01]
        last = jnp.maximum(indptr[k01 + 1] - 1, start)
        u = jax.random.uniform(rng, k01.shape)
        flat_idx = _bisect(state["cp"], start.reshape(-1), last.reshape(-1),
                           u.reshape(-1)).reshape(k01.shape)
        flat_idx = jnp.minimum(flat_idx, last)
        neg_items = indices[flat_idx] + 1
        neg_probs = state["p"][flat_idx + 1]
        return neg_items, p01 + jnp.log(neg_probs)

    def compute_item_p(self, state, query, pos_items):
        pos = pos_items if pos_items.ndim > 1 else pos_items[:, None]
        k0 = state["cd0"][pos]
        k1 = state["cd1"][pos]
        c0 = state["c0_"][k0]                                           # [..., D/2]
        c1 = state["c1_"][k1]
        half = query.shape[-1] // 2
        q0, q1 = query[..., :half], query[..., half:]
        if query.ndim == pos.ndim:
            r = jnp.einsum("...ld,...d->...l", c0, q0) + jnp.einsum("...ld,...d->...l", c1, q1)
        else:
            r = jnp.einsum("...qd,...ld->...ql", q0, c0) + jnp.einsum("...qd,...ld->...ql", q1, c1)
        if "p" in state:
            r = r + jnp.log(state["p"][pos])
        return r.reshape(pos_items.shape)


class MIDXSamplerPop(MIDXSamplerUniform):
    """MIDX with popularity-weighted within-bucket selection."""

    def __init__(self, pop_count: np.ndarray, num_clusters: int, scorer_fn=None, mode: int = 1):
        super().__init__(pop_count.shape[0], num_clusters, scorer_fn)
        pop = jnp.asarray(pop_count, dtype=jnp.float32)
        if mode == 0:
            pop = jnp.log(pop + 1.0)
        elif mode == 1:
            pop = jnp.log(pop + 1.0) + 1e-6
        elif mode == 2:
            pop = pop ** 0.75
        self.pop_count = pop

    def _update(self, state, item_embs, m0, m1):
        from ..models.scorer import EuclideanScorer
        norm = self.pop_count[1:]  # drop pad slot; item_embs excludes pad row
        if isinstance(self.scorer, EuclideanScorer):
            norm = norm * jnp.exp(-0.5 * jnp.sum(item_embs ** 2, axis=-1))
        state["wkk"] = m0.T @ (m1 * norm[:, None])
        self._attach_pop_cdf(state, norm)


class ClusterSamplerUniform(MIDXSamplerUniform):
    """Single-codebook PRIS cluster sampler."""

    def update(self, rng, item_embs: Array, max_iter: int = 30):
        from ..models.scorer import CosineScorer
        if isinstance(self.scorer, CosineScorer):
            item_embs = item_embs / (jnp.linalg.norm(item_embs, axis=-1, keepdims=True) + EPS)
        c, cd = kmeans(rng, item_embs, self.K, max_iter)
        state = {
            "c": c,
            "c_": jnp.concatenate([jnp.zeros((1, c.shape[1]), c.dtype), c]),
            "cd": jnp.concatenate([-jnp.ones(1, cd.dtype), cd]) + 1,
        }
        indices, indptr = construct_index(cd, self.K)
        state["indices"], state["indptr"] = indices, indptr
        m = jax.nn.one_hot(cd, self.K, dtype=item_embs.dtype)
        self._update(state, item_embs, m)
        return state

    def _update(self, state, item_embs, m):
        from ..models.scorer import EuclideanScorer
        if not isinstance(self.scorer, EuclideanScorer):
            state["wkk"] = m.sum(0)
        else:
            norm = jnp.exp(-0.5 * jnp.sum(item_embs ** 2, axis=-1))
            state["wkk"] = (m * norm[:, None]).sum(0)
            self._attach_pop_cdf(state, norm)

    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None):
        from ..models.scorer import CosineScorer
        if isinstance(self.scorer, CosineScorer):
            query = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + EPS)
        qshape = _num_queries_shape(query)
        q = query.reshape(-1, query.shape[-1])
        r = q @ state["c"].T
        kkey, ikey = jax.random.split(rng)
        k = _categorical(kkey, r, num_neg)                             # softmax(r) sampling
        p = jnp.take_along_axis(r, k, axis=-1)
        neg_items, neg_prob = self._sample_in_bucket(state, ikey, k, p)
        neg_items = neg_items.reshape(*qshape, num_neg)
        neg_prob = neg_prob.reshape(*qshape, num_neg)
        if pos_items is not None:
            pos_prob = self.compute_item_p(state, query, pos_items)
            return pos_prob, neg_items, neg_prob
        return neg_items, neg_prob

    def compute_item_p(self, state, query, pos_items):
        shape = pos_items.shape
        pos = pos_items if pos_items.ndim > 1 else pos_items[:, None]
        k = state["cd"][pos]
        c = state["c_"][k]
        if query.ndim == pos.ndim:
            r = jnp.einsum("...ld,...d->...l", c, query)
        else:
            r = jnp.einsum("...qd,...ld->...ql", query, c)
        r = r.reshape(shape)
        if "p" in state:
            r = r + jnp.log(state["p"][pos].reshape(shape))
        return r


class ClusterSamplerPop(ClusterSamplerUniform):
    def __init__(self, pop_count: np.ndarray, num_clusters: int, scorer_fn=None, mode: int = 1):
        super().__init__(pop_count.shape[0], num_clusters, scorer_fn)
        pop = jnp.asarray(pop_count, dtype=jnp.float32)
        if mode == 0:
            pop = jnp.log(pop + 1.0)
        elif mode == 1:
            pop = jnp.log(pop + 1.0) + 1e-6
        elif mode == 2:
            pop = pop ** 0.75
        self.pop_count = pop

    def _update(self, state, item_embs, m):
        from ..models.scorer import EuclideanScorer
        norm = self.pop_count[1:]
        if isinstance(self.scorer, EuclideanScorer):
            norm = norm * jnp.exp(-0.5 * jnp.sum(item_embs ** 2, axis=-1))
        state["wkk"] = (m * norm[:, None]).sum(0)
        self._attach_pop_cdf(state, norm)


class LSHSampler(Sampler):
    """Multi-table SimHash LSH sampler with collision-probability correction
    ("Unbiased LSH-based samplers for partition function estimation")."""

    def __init__(self, num_items: int, n_dims: int, n_bits: int = 4,
                 n_table: int = 16, scorer_fn=None, seed: int = 0):
        super().__init__(num_items, scorer_fn)
        self.n_dims, self.n_bits, self.n_table = n_dims, n_bits, n_table
        key = jax.random.PRNGKey(seed)
        w = jax.random.uniform(key, (n_dims, n_bits, n_table))
        self.weight_vectors = w / jnp.linalg.norm(w, axis=0, keepdims=True)
        self.base = (2 ** jnp.arange(n_bits - 1, -1, -1)).astype(jnp.float32)

    def _hash(self, x: Array) -> Array:
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
        y = (xn @ self.weight_vectors.reshape(self.n_dims, -1)).reshape(
            x.shape[0], self.n_bits, self.n_table)
        bits = (y > 0).astype(jnp.float32)
        return jnp.einsum("nkl,k->nl", bits, self.base).astype(jnp.int32)  # [N, L]

    def update(self, rng, item_embs: Array):
        code = self._hash(item_embs)                                    # [N, L]
        n_buckets = 2 ** self.n_bits
        indices, indptrs = [], []
        for t in range(self.n_table):
            idx, ptr = construct_index(code[:, t], n_buckets)
            indices.append(idx)
            indptrs.append(ptr)
        return {"indices": jnp.stack(indices), "indptr": jnp.stack(indptrs),
                "item_embs": item_embs}

    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None):
        code = self._hash(query).T                                      # [L, B]
        indptr = state["indptr"]                                        # [L, K+1]
        start = jnp.take_along_axis(indptr, code, axis=1)               # [L, B]
        end = jnp.take_along_axis(indptr, code + 1, axis=1)
        n_cand = end - start                                            # [L, B]
        len_item = n_cand.sum(0)                                        # [B]
        cum_len = jnp.cumsum(n_cand, axis=0).T                          # [B, L]
        ukey, fkey = jax.random.split(rng)
        u = jax.random.uniform(ukey, (query.shape[0], num_neg))
        rand_idx = jnp.floor(u * jnp.maximum(len_item, 1)[:, None]).astype(jnp.int32)
        rand_idx = jnp.minimum(rand_idx, jnp.maximum(len_item[:, None] - 1, 0))
        table_id = jax.vmap(lambda cl, ri: jnp.searchsorted(cl, ri, side="right"))(
            cum_len, rand_idx)                                          # [B, neg]
        prev = jnp.where(table_id > 0,
                         jnp.take_along_axis(cum_len, jnp.maximum(table_id - 1, 0), axis=1), 0)
        offset = rand_idx - prev
        starts_bt = jnp.take_along_axis(start.T, table_id, axis=1)      # [B, neg]
        flat = starts_bt + offset
        item_id = state["indices"][table_id, flat]                      # [B, neg]
        # collision-probability correction
        emb = state["item_embs"][item_id]                               # [B, neg, D]
        qn = query / (jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-10)
        en = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-10)
        cos = jnp.clip(jnp.einsum("bd,bnd->bn", qn, en), -1.0, 1.0)
        theta = jnp.arccos(cos)
        coll = 1.0 - theta / jnp.pi
        weight = 1.0 - (1.0 - coll ** self.n_bits) ** self.n_table
        prob = weight / jnp.maximum(len_item, 1)[:, None]
        neg_id = item_id + 1
        log_neg_prob = jnp.log(prob + EPS)
        # fall back to uniform for empty candidate sets
        empty = (len_item == 0)[:, None]
        uni = jax.random.randint(fkey, neg_id.shape, 1, self.num_items + 1)
        neg_id = jnp.where(empty, uni, neg_id)
        log_neg_prob = jnp.where(empty, 0.0, log_neg_prob)
        if pos_items is not None:
            return jnp.zeros_like(pos_items, dtype=jnp.float32), neg_id, log_neg_prob
        return neg_id, log_neg_prob


class RetrieverSampler(Sampler):
    """Wrap a trained retriever as the proposal distribution (IRGAN)."""

    def __init__(self, num_items: int, retriever=None, method: str = "brute", t: float = 1.0):
        super().__init__(num_items)
        self.retriever = retriever
        self.method = method
        self.T = t

    def update(self, rng, item_embs=None):
        return self.retriever.make_sampling_state()

    def __call__(self, state, rng, query, num_neg, pos_items=None, user_hist=None,
                 batch=None):
        return self.retriever.sampling_from_state(
            state, rng, batch if batch is not None else query, num_neg,
            method=self.method, t=self.T, pos_items=pos_items, user_hist=user_hist)
