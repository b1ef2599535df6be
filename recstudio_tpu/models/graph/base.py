"""Shared machinery for graph CF models (LightGCN / NGCF / SGL / SimGCL / NCL).

The reference propagates over a DGL CUDA sparse graph
(recstudio/model/module/graphmodule.py:114-276). TPU re-design: the
(bidirectional, symmetric-normalized) user-item graph is an edge list, and one
propagation layer is ``segment_sum(emb[src] * norm[src], dst) * norm[dst]`` —
gather + segment-sum compile to efficient XLA scatter kernels and run inside
the same jit as the training step, so the whole-graph propagation fuses with
the loss computation exactly like the reference's per-forward
``update_encoders`` (graph/lightgcn.py:53-66).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..basemodel import BaseRetriever
from ..init import init_parameters
from ..loss_func import BPRLoss
from ..scorer import InnerProductScorer


class BaseGraphRetriever(BaseRetriever):
    """Retriever whose user/item embeddings come from whole-graph propagation.

    params: {"user_embedding": [U, D], "item_embedding": [N, D], ...}.
    Subclasses implement ``propagate(params) -> (user_all, item_all)``.
    """

    def _init_model(self, train_data, drop_unused_field: bool = True):
        # bypass the two-tower net: graph models own their parameter dict
        from ..basemodel.recommender import Recommender
        Recommender._init_model(self, train_data, drop_unused_field)
        self.num_users = train_data.num_users
        self.num_items = train_data.num_items
        self.query_fields = {self.fuid}
        self.item_fields = {self.fiid}
        self._item_feat_arrays = None
        self.net = None
        self.score_func = InnerProductScorer()
        self.sampler = self._get_sampler(train_data)
        self._build_graph(train_data)

    # dense normalized adjacency is materialized when it fits this budget:
    # one [N, N] f32 matmul per layer runs on the MXU at full throughput,
    # vs gather + scatter for the edge list (measured 31 ms -> sub-ms per
    # LightGCN step on ml-100k). Larger graphs use the ELLPACK path below.
    _DENSE_ADJ_BYTES = 512 << 20

    # degree buckets for the padded-neighbor-list (ELLPACK) layout; nodes
    # with deg > the last bucket split into virtual rows combined afterwards
    _ELL_BUCKETS = (4, 8, 16, 32, 64, 128)

    def _build_graph(self, train_data):
        """Bidirectional user-item edges with symmetric normalization."""
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(self.fuid))[sub].astype(np.int32)
        items = np.asarray(train_data.inter_feat.get_col(self.fiid))[sub].astype(np.int32)
        n = self.num_users + self.num_items
        src = np.concatenate([users, items + self.num_users])
        dst = np.concatenate([items + self.num_users, users])
        deg = np.bincount(src, minlength=n).astype(np.float32)
        norm = np.zeros_like(deg)
        np.power(deg, -0.5, out=norm, where=deg > 0)
        # dst-sorted edge order: contiguous per-node neighbor slices for the
        # ELL layout (and sequential scatters for subclasses' own edge ops)
        order = np.argsort(dst, kind="stable")
        src, dst = src[order], dst[order]
        self._edges = (jnp.asarray(src), jnp.asarray(dst))
        self._edge_norm = jnp.asarray(norm)
        self._num_nodes = n
        w = norm[src] * norm[dst]
        self._edge_w = jnp.asarray(w)
        self._adj = None
        if n * n * 4 <= self._DENSE_ADJ_BYTES:
            adj = np.zeros((n, n), np.float32)
            np.add.at(adj, (dst, src), w)
            self._adj = jnp.asarray(adj)
        else:
            self._build_ell(src, dst, w, n)

    def _build_ell(self, src, dst, w, n):
        """Degree-bucketed padded neighbor lists (ELLPACK layout).

        Past the dense budget, ``segment_sum`` is the wrong TPU primitive:
        XLA lowers the scatter-add to ~45 ns per serialized update, so a
        6M-edge graph costs ~270 ms per propagation layer. This layout makes
        propagation scatter-free in BOTH directions:

        - each node's incoming edges (a contiguous dst-sorted slice) pad to
          the smallest bucket width K; propagation per bucket is one padded
          gather ``emb[src_pad] * w_pad`` and an in-register sum over K —
          fully vectorized HBM reads, zero scatters;
        - hub nodes (deg > max K) split into virtual rows of max-K combined
          by one tiny segment-sum over the few hub partials;
        - results assemble in node order via ONE inverse-permutation gather;
        - the BACKWARD is the forward operator again: the normalized
          bidirectional adjacency is symmetric by construction (w_uv =
          norm_u*norm_v = w_vu and both directions are present), so
          d/demb (A @ emb) applied to a cotangent g is A @ g — installed as
          a custom VJP, which is what keeps autodiff from re-deriving a 6M-
          row scatter from the gathers. (The reference leans on DGL's CUDA
          spmm for this regime, recstudio/model/module/graphmodule.py:201.)
        """
        E = len(src)
        deg_in = np.bincount(dst, minlength=n)
        row_start = np.concatenate([[0], np.cumsum(deg_in)])
        kmax = self._ELL_BUCKETS[-1]
        tables = []          # (src_pad [r, K], w_pad [r, K]) per bucket
        row_node = []        # node id per emitted combined-row, in order
        lo = 0
        for K in self._ELL_BUCKETS:
            sel = np.where((deg_in > lo) & (deg_in <= K))[0]
            lo = K
            if not len(sel):
                continue
            idx = row_start[sel][:, None] + np.arange(K)[None, :]
            mask = np.arange(K)[None, :] < deg_in[sel][:, None]
            idx = np.minimum(idx, E - 1)
            tables.append((jnp.asarray(np.where(mask, src[idx], 0), jnp.int32),
                           jnp.asarray(np.where(mask, w[idx], 0.0), jnp.float32)))
            row_node.append(sel)
        hubs = np.where(deg_in > kmax)[0]
        hub_seg = None
        if len(hubs):
            nv = -(-deg_in[hubs] // kmax)                # virtual rows per hub
            vnode = np.repeat(hubs, nv)                  # hub id per virtual row
            voff = (np.arange(len(vnode))
                    - np.repeat(np.cumsum(nv) - nv, nv)) * kmax
            starts = row_start[vnode] + voff
            idx = starts[:, None] + np.arange(kmax)[None, :]
            mask = idx < row_start[vnode][:, None] + deg_in[vnode][:, None]
            idx = np.minimum(idx, E - 1)
            tables.append((jnp.asarray(np.where(mask, src[idx], 0), jnp.int32),
                           jnp.asarray(np.where(mask, w[idx], 0.0), jnp.float32)))
            hub_seg = (jnp.asarray(np.repeat(np.arange(len(hubs)), nv),
                                   jnp.int32), len(hubs), len(vnode))
            row_node.append(hubs)
        # node -> its combined-partial row; deg-0 nodes point at a zero row
        order = np.concatenate(row_node) if row_node else np.zeros(0, np.int64)
        slot = np.full(n, len(order), np.int64)
        slot[order] = np.arange(len(order))
        self._ell = (tables, hub_seg, jnp.asarray(slot, jnp.int32))
        self._sym_spmm = self._make_sym_spmm()

    def _ell_apply(self, emb: jax.Array) -> jax.Array:
        tables, hub_seg, slot = self._ell
        parts = []
        n_tab = len(tables) - (1 if hub_seg is not None else 0)
        for src_pad, w_pad in tables[:n_tab]:
            g = emb.at[src_pad].get(mode="promise_in_bounds")   # [r, K, D]
            parts.append((g * w_pad[..., None]).sum(1))
        if hub_seg is not None:
            seg, n_hub, _ = hub_seg
            src_pad, w_pad = tables[-1]
            g = emb.at[src_pad].get(mode="promise_in_bounds")
            vpart = (g * w_pad[..., None]).sum(1)
            parts.append(jax.ops.segment_sum(vpart, seg, num_segments=n_hub,
                                             indices_are_sorted=True))
        allp = jnp.concatenate(parts + [jnp.zeros((1, emb.shape[-1]),
                                                  emb.dtype)], axis=0)
        return allp.at[slot].get(mode="promise_in_bounds")

    def _make_sym_spmm(self):
        @jax.custom_vjp
        def spmm(emb):
            return self._ell_apply(emb)

        spmm.defvjp(lambda emb: (self._ell_apply(emb), None),
                    lambda _, g: (self._ell_apply(g),))
        return spmm

    def _gcn_layer(self, emb: jax.Array) -> jax.Array:
        if self._adj is not None:
            return self._adj @ emb
        if getattr(self, "_sym_spmm", None) is not None:
            return self._sym_spmm(emb)
        # fallback (e.g. LightGCN's dense adj was folded into the collapsed
        # operator and a caller forces the per-layer loop anyway)
        src, dst = self._edges
        msg = emb[src] * self._edge_w[:, None]
        return jax.ops.segment_sum(msg, dst, num_segments=self._num_nodes,
                                   indices_are_sorted=True)

    # -- parameters ------------------------------------------------------
    def _init_variables(self, batch):
        rng = self.next_rng()
        k1, k2 = jax.random.split(rng)
        d = self.embed_dim
        params = {
            "user_embedding": 0.02 * jax.random.normal(k1, (self.num_users, d)),
            "item_embedding": 0.02 * jax.random.normal(k2, (self.num_items, d)),
        }
        return {"params": params}

    # -- propagation (subclass hook) ---------------------------------------
    def propagate(self, params) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def _compute_item_vector(self, params):
        return self.propagate(params)[1][1:]

    # propagation yields BOTH towers; cache user_all next to item_vector at
    # refresh time so eval topk doesn't re-run the whole-graph propagation
    # per batch (at amazon-book scale one propagate is ~all of a batch's
    # eval cost). The device (block-fit) refresh keeps the cache fresh too.
    def _epoch_refresh(self, nepoch: int):
        before = self.states.get("item_vector")
        super()._epoch_refresh(nepoch)
        after = self.states.get("item_vector")
        if after is not None and after is not before:
            if not hasattr(self, "_user_all_fn"):
                self._user_all_fn = jax.jit(lambda p: self.propagate(p)[0])
            self.states["user_all"] = self._user_all_fn(self.params)

    def _device_epoch_refresh_fn(self):
        fn = super()._device_epoch_refresh_fn()
        if fn is None:
            return None

        def refresh(params, states, rng):
            new = fn(params, states, rng)
            if "user_all" in new:
                new["user_all"] = self.propagate(params)[0]
            return new

        return refresh

    def _encode_query_from(self, user_all, batch):
        return user_all[batch[self.fuid]]

    # -- overridden pure paths ------------------------------------------

    def _get_loss_func(self):
        return BPRLoss()

    def forward(self, params, batch, rng, states, full_score: bool = False,
                training: bool = True, **kwargs):
        user_all, item_all = self.propagate(params)
        query = self._encode_query_from(user_all, batch)
        pos_vec = item_all[batch[self.fiid]]
        pos_score = self.score_func(query, pos_vec)
        log_pos_prob, neg_ids, log_neg_prob = self.sampler(
            states.get("sampler", ()), rng, jax.lax.stop_gradient(query),
            self.neg_count, pos_items=batch[self.fiid])
        neg_vec = item_all[neg_ids]
        neg_score = self.score_func(query, neg_vec)
        return {
            "score": {"pos_score": pos_score, "log_pos_prob": log_pos_prob,
                      "neg_score": neg_score, "log_neg_prob": log_neg_prob},
            "query": query, "item": pos_vec, "neg_id": neg_ids,
            "user_all": user_all, "item_all": item_all,
        }

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        item_vector = states.get("item_vector")
        user_all = states.get("user_all")
        if item_vector is None:
            user_all, item_all = self.propagate(params)
            item_vector = item_all[1:]
        elif user_all is None:
            user_all, _ = self.propagate(params)
        query = self._encode_query_from(user_all, batch)
        scores = self.score_func(query, item_vector)
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items
