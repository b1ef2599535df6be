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
    # LightGCN step on ml-100k). Larger graphs use the sorted-segment path.
    _DENSE_ADJ_BYTES = 512 << 20

    def _build_graph(self, train_data):
        """Bidirectional user-item edges with symmetric normalization."""
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(self.fuid))[sub].astype(np.int32)
        items = np.asarray(train_data.inter_feat.get_col(self.fiid))[sub].astype(np.int32)
        n = self.num_users + self.num_items
        src = np.concatenate([users, items + self.num_users])
        dst = np.concatenate([items + self.num_users, users])
        deg = np.bincount(src, minlength=n).astype(np.float32)
        norm = np.where(deg > 0, deg ** -0.5, 0.0)
        # dst-sorted edge order: segment_sum with indices_are_sorted=True
        # lowers to a sequential scatter instead of a random one
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

    def _gcn_layer(self, emb: jax.Array) -> jax.Array:
        if self._adj is not None:
            return self._adj @ emb
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
        user_all, item_all = None, None
        if item_vector is None:
            user_all, item_all = self.propagate(params)
            item_vector = item_all[1:]
        else:
            user_all, _ = self.propagate(params)
        query = self._encode_query_from(user_all, batch)
        scores = self.score_func(query, item_vector)
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items
