"""KGAT: knowledge graph attention network.

Reference: recstudio/model/kg/kgat.py — the user-item graph and the KG merge
into one collaborative knowledge graph (CKG); propagation layers aggregate
neighbors weighted by a TransR-derived attention that is refreshed once per
epoch; a TransR triplet loss regularizes entity/relation embeddings. The DGL
sparse ops become edge-list gathers + segment softmax/sum.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ann.sampler import UniformSampler
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..scorer import InnerProductScorer
from .cfkg import _FrameLoader
from .kglearning import TransRTower


class KGAT(BaseRetriever):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)
        mc = config["model"]
        self.alg_type = mc.get("alg_type", "bi")
        self.mess_dropout = mc.get("mess_dropout", [0.1, 0.1])
        self.layer_size = mc["layer_size"]

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _set_data_field(self, data):
        self.fhid = data.get_network_field(self.kg_index, 0, 0)
        self.frid = data.get_network_field(self.kg_index, 0, 1)
        self.ftid = data.get_network_field(self.kg_index, 0, 2)
        data.use_field = {data.fuid, data.fiid, data.frating,
                          self.fhid, self.frid, self.ftid}

    def _init_model(self, train_data, drop_unused_field: bool = True):
        from ..basemodel.recommender import Recommender
        Recommender._init_model(self, train_data, drop_unused_field)
        self.num_users = train_data.num_users
        self.num_items = train_data.num_items
        self.num_entities = train_data.num_values(self.fhid)
        # relations: [pad, inter, inter_rev] + KG relations (offset by 3)
        self.num_kg_relations = train_data.num_values(self.frid)
        self.num_relations = self.num_kg_relations + 3
        self.query_fields = {self.fuid}
        self.item_fields = {self.fiid}
        self._item_feat_arrays = None
        self.net = None
        self.score_func = InnerProductScorer()
        self.sampler = UniformSampler(self.num_items)
        self.tower = TransRTower(self.config, self.num_entities, self.num_relations)
        self.kg_loss_fn = BPRLoss()
        self._build_ckg(train_data)

    def _build_ckg(self, train_data):
        """CKG edges: bidirectional user-item + KG triples (entity offset by
        num_users). Relation ids: 1 = interact, 2 = interacted-by, KG rel + 2."""
        U = self.num_users
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(self.fuid))[sub].astype(np.int64)
        items = np.asarray(train_data.inter_feat.get_col(self.fiid))[sub].astype(np.int64) + U
        kg = train_data.network_feat[self.kg_index]
        h = np.asarray(kg.get_col(self.fhid)).astype(np.int64) + U
        t = np.asarray(kg.get_col(self.ftid)).astype(np.int64) + U
        r = np.asarray(kg.get_col(self.frid)).astype(np.int64) + 2
        src = np.concatenate([users, items, h])
        dst = np.concatenate([items, users, t])
        rel = np.concatenate([np.ones_like(users), 2 * np.ones_like(items), r])
        self._edges = (jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel))
        self._n_nodes = U + self.num_entities
        # si-normalized initial attention: 1 / out_degree(src)
        deg = np.bincount(src, minlength=self._n_nodes).astype(np.float32)
        self._init_att = jnp.asarray(1.0 / np.maximum(deg, 1.0))[self._edges[0]]

    def _get_loss_func(self):
        return BPRLoss()

    def _init_variables(self, batch):
        rng = self.next_rng()
        k1, k2 = jax.random.split(rng)
        d = self.embed_dim
        params = {"user_embedding": (0.02 * jax.random.normal(k1, (self.num_users, d))).at[0].set(0.0)}
        params.update(self.tower.init_params(k2))
        # per-layer Bi-combiner weights
        sizes = [d] + list(self.layer_size)
        for i, (din, dout) in enumerate(zip(sizes[:-1], sizes[1:])):
            ki = jax.random.fold_in(rng, 100 + i)
            std = (2.0 / (din + dout)) ** 0.5
            params[f"layer_{i}"] = {
                "W1": {"kernel": std * jax.random.normal(ki, (din, dout)),
                       "bias": jnp.zeros(dout)},
                "W2": {"kernel": std * jax.random.normal(
                    jax.random.fold_in(ki, 1), (din, dout)),
                       "bias": jnp.zeros(dout)},
            }
        return {"params": params}

    def _get_train_loaders(self, train_data, ddp=False):
        bs = self.config["train"]["batch_size"]
        return [train_data.train_loader(batch_size=bs, shuffle=True),
                _FrameLoader(train_data.network_feat[self.kg_index], bs)]

    def current_epoch_trainloaders(self, nepoch):
        return list(self.trainloaders), False

    def _supports_scan_epoch(self, train_data):
        return False

    # -- attention -------------------------------------------------------
    def _node_embeddings(self, params):
        return jnp.concatenate([params["user_embedding"], params["ent_embedding"]])

    def _compute_attention(self, params):
        """pi(h, r, t) = (W_r e_t)^T tanh(W_r e_h + r_e), softmax per source."""
        src, dst, rel = self._edges
        emb = self._node_embeddings(params)
        e_h, e_t = emb[src], emb[dst]
        d, pd = self.embed_dim, self.tower.pro_embed_dim
        scores = jnp.zeros(src.shape[0], jnp.float32)
        for r_id in range(1, self.num_relations):
            W = params["pro_embedding"][r_id].reshape(d, pd)
            r_e = params["rel_embedding"][r_id]
            s = jnp.sum((e_t @ W) * jnp.tanh(e_h @ W + r_e), axis=-1)
            scores = jnp.where(rel == r_id, s, scores)
        # segment softmax over outgoing edges of each source node
        smax = jax.ops.segment_max(scores, src, num_segments=self._n_nodes)
        ex = jnp.exp(scores - smax[src])
        ssum = jax.ops.segment_sum(ex, src, num_segments=self._n_nodes)
        return ex / jnp.maximum(ssum[src], 1e-12)

    def _epoch_refresh(self, nepoch: int):
        att = jax.jit(self._compute_attention)(self.params)
        self.states["att"] = att
        self.states["item_vector"] = jax.jit(self._compute_item_vector)(self.params)

    # -- propagation --------------------------------------------------------
    def _propagate(self, params, att):
        src, dst, _ = self._edges
        x = self._node_embeddings(params)
        outs = [x]
        sizes = [self.embed_dim] + list(self.layer_size)
        for i in range(len(sizes) - 1):
            msg = x[src] * att[:, None]
            side = jax.ops.segment_sum(msg, dst, num_segments=self._n_nodes)
            W1, W2 = params[f"layer_{i}"]["W1"], params[f"layer_{i}"]["W2"]
            x = jax.nn.leaky_relu((x + side) @ W1["kernel"] + W1["bias"]) \
                + jax.nn.leaky_relu((x * side) @ W2["kernel"] + W2["bias"])
            outs.append(x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12))
        out = jnp.concatenate(outs, axis=-1)
        return out[: self.num_users], out[self.num_users:]

    def _compute_item_vector(self, params):
        att = self.states.get("att")
        if att is None:
            att = self._init_att
        _, ent_all = self._propagate(params, att)
        return ent_all[1: self.num_items]

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        att = states.get("att", self._init_att)
        user_all, ent_all = self._propagate(params, att)
        item_vector = ent_all[1: self.num_items]
        query = user_all[batch[self.fuid]]
        scores = self.score_func(query, item_vector)
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items

    # -- training ----------------------------------------------------------
    def training_step(self, params, batch, rng, states):
        if self.fhid in batch:  # TransR regularizer phase
            scores = self.tower.triplet_scores(
                params, rng, batch[self.fhid], batch[self.frid] + 2,
                batch[self.ftid], self.neg_count)
            return self.kg_loss_fn(None, **scores)
        att = states.get("att", self._init_att)
        user_all, ent_all = self._propagate(params, att)
        query = user_all[batch[self.fuid]]
        pos_vec = ent_all[batch[self.fiid]]
        log_pos, neg_ids, log_neg = self.sampler(
            (), rng, jax.lax.stop_gradient(query), self.neg_count,
            pos_items=batch[self.fiid])
        neg_vec = ent_all[neg_ids]
        pos_score = self.score_func(query, pos_vec)
        neg_score = self.score_func(query, neg_vec)
        return self.loss_fn(batch[self.frating], pos_score, log_pos,
                            neg_score, log_neg)
