"""KGIN: knowledge graph intent network.

Reference: recstudio/model/kg/kgin.py — relation-modulated KG propagation for
entities, intent-disentangled aggregation for users (softmax(disen_att) over
relations defines each intent), residual readout, and an intent-independence
regularizer (distance correlation / mutual information / cosine).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ann.sampler import UniformSampler
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss, l2_reg_loss_fn
from ..scorer import InnerProductScorer


def _nrm(x):
    return x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)


class KGIN(BaseRetriever):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)
        mc = config["model"]
        self.num_factors = mc["num_factors"]
        self.num_layers = mc["num_layers"]

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
        self.num_relations = train_data.num_values(self.frid)
        self.query_fields = {self.fuid}
        self.item_fields = {self.fiid}
        self._item_feat_arrays = None
        self.net = None
        self.score_func = InnerProductScorer()
        self.sampler = UniformSampler(self.num_items)
        self._build_graphs(train_data)

    def _build_graphs(self, train_data):
        kg = train_data.network_feat[self.kg_index]
        h = np.asarray(kg.get_col(self.fhid)).astype(np.int64)
        t = np.asarray(kg.get_col(self.ftid)).astype(np.int64)
        r = np.asarray(kg.get_col(self.frid)).astype(np.int64)
        src = np.concatenate([h, t])
        dst = np.concatenate([t, h])
        rel = np.concatenate([r, r])
        self._kg_edges = (jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel))
        deg = np.bincount(dst, minlength=self.num_entities).astype(np.float32)
        self._kg_in_deg = jnp.asarray(np.maximum(deg, 1.0))
        # bi-normalized user-item interaction matrix (rows users, cols items)
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(self.fuid))[sub]
        items = np.asarray(train_data.inter_feat.get_col(self.fiid))[sub]
        du = np.bincount(users, minlength=self.num_users).astype(np.float32)
        di = np.bincount(items, minlength=self.num_items).astype(np.float32)
        vals = 1.0 / np.sqrt(np.maximum(du[users], 1) * np.maximum(di[items], 1))
        self._ui = (jnp.asarray(users.astype(np.int64)),
                    jnp.asarray(items.astype(np.int64)),
                    jnp.asarray(vals.astype(np.float32)))

    def _get_loss_func(self):
        return BPRLoss()

    def _init_variables(self, batch):
        rng = self.next_rng()
        k = jax.random.split(rng, 5)
        d = self.embed_dim
        std = (2.0 / (self.num_factors + self.num_relations)) ** 0.5
        return {"params": {
            "user_embedding": (0.02 * jax.random.normal(k[0], (self.num_users, d))).at[0].set(0.0),
            "ent_embedding": (0.02 * jax.random.normal(k[1], (self.num_entities, d))).at[0].set(0.0),
            "latent_embedding": 0.02 * jax.random.normal(k[2], (self.num_factors, d)),
            "rel_embedding": (0.02 * jax.random.normal(k[3], (self.num_relations, d))).at[0].set(0.0),
            "disen_att": std * jax.random.normal(k[4], (self.num_factors, self.num_relations)),
        }}

    # -- propagation --------------------------------------------------------
    def propagate(self, params):
        src, dst, rel = self._kg_edges
        u_idx, i_idx, ui_val = self._ui
        ent = params["ent_embedding"]
        user = params["user_embedding"]
        ent_res, user_res = ent, user
        for _ in range(self.num_layers):
            msg = params["rel_embedding"][rel] * ent[src]
            ent_new = jax.ops.segment_sum(msg, dst, num_segments=self.num_entities) \
                / self._kg_in_deg[:, None]
            # user side: normalized aggregation of item embeddings
            gathered = ent[i_idx] * ui_val[:, None]
            user_agg = jax.ops.segment_sum(gathered, u_idx,
                                           num_segments=self.num_users)
            score = user @ params["latent_embedding"].T           # [U, K]
            disen = jax.nn.softmax(params["disen_att"], -1) @ params["rel_embedding"]
            mix = score @ disen                                    # [U, D]
            user_new = user_agg * mix + user_agg
            ent = _nrm(ent_new)
            user = _nrm(user_new)
            ent_res = ent_res + ent
            user_res = user_res + user
        return user_res, ent_res

    def _intent_independence(self, params):
        mc = self.config["model"]
        att = params["disen_att"]
        kind = mc.get("intents_indep", "distance")
        if kind == "cosine":
            n = _nrm(att)
            return (n @ n.T).sum() / 2
        if kind == "mi":
            n = _nrm(att)
            logits = n @ n.T / 0.2
            return -jnp.sum(jnp.diagonal(jax.nn.log_softmax(logits, -1)))
        # pairwise distance correlation
        def dcor(a, b):
            dim = a.shape[0]
            a1, b1 = a[:, None], b[:, None]
            da = jnp.sqrt(jnp.maximum(a1 ** 2 - 2 * a1 @ a1.T + (a1 ** 2).T, 0) + 1e-8)
            db = jnp.sqrt(jnp.maximum(b1 ** 2 - 2 * b1 @ b1.T + (b1 ** 2).T, 0) + 1e-8)
            A = da - da.mean(0, keepdims=True) - da.mean(1, keepdims=True) + da.mean()
            B = db - db.mean(0, keepdims=True) - db.mean(1, keepdims=True) + db.mean()
            dcov = lambda X, Y: jnp.sqrt(jnp.maximum((X * Y).sum() / dim ** 2, 0) + 1e-8)
            return dcov(A, B) / jnp.sqrt(dcov(A, A) * dcov(B, B) + 1e-8)
        cor = 0.0
        for i in range(self.num_factors):
            for j in range(i + 1, self.num_factors):
                cor = cor + dcor(att[i], att[j])
        return cor

    def _compute_item_vector(self, params):
        _, ent_res = self.propagate(params)
        return ent_res[1: self.num_items]

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        user_res, ent_res = self.propagate(params)
        query = user_res[batch[self.fuid]]
        scores = self.score_func(query, ent_res[1: self.num_items])
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items

    def training_step(self, params, batch, rng, states):
        mc = self.config["model"]
        user_res, ent_res = self.propagate(params)
        query = user_res[batch[self.fuid]]
        pos_vec = ent_res[batch[self.fiid]]
        pos_score = self.score_func(query, pos_vec)
        log_pos, neg_ids, log_neg = self.sampler(
            (), rng, jax.lax.stop_gradient(query), self.neg_count,
            pos_items=batch[self.fiid])
        neg_score = self.score_func(query, ent_res[neg_ids])
        loss = self.loss_fn(None, pos_score, log_pos, neg_score, log_neg)
        return loss + mc["l2_reg"] * l2_reg_loss_fn(query, pos_vec) \
            + mc["sim_regularity"] * self._intent_independence(params)
