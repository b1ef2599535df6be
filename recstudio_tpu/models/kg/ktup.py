"""KTUP: translation-based recommendation unified with KG learning.

Reference: recstudio/model/kg/ktup.py — TransH KG tower and a preference-
induction recommendation module (straight-through Gumbel preference over
relations), alternating rec/KG training epochs (reference :73-82). Evaluation
scores every item through its induced preference projection.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ann.sampler import UniformSampler
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss, HingeLoss
from ..scorer import EuclideanScorer, NormScorer
from .cfkg import _FrameLoader
from .kglearning import TransHTower


class KTUP(BaseRetriever):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)
        mc = config["model"]
        self.train_rec_step = mc["train_rec_step"]
        self.train_kg_step = mc["train_kg_step"]
        self.L1_flag = mc["L1_flag"]
        self.use_st_gumbel = mc["use_st_gumbel"]

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
        self.score_func = NormScorer(1) if self.L1_flag else EuclideanScorer()
        self.sampler = UniformSampler(self.num_items)
        self.tower = TransHTower(self.config, self.num_entities, self.num_relations)
        self.kg_loss_fn = HingeLoss(self.config["model"].get("margin", 2))

    def _get_loss_func(self):
        return BPRLoss()

    def _init_variables(self, batch):
        rng = self.next_rng()
        keys = jax.random.split(rng, 4)
        d = self.embed_dim

        def nrm(x):
            return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)

        params = {
            "user_embedding": (0.02 * jax.random.normal(keys[0], (self.num_users, d))).at[0].set(0.0),
            "item_embedding": nrm(0.02 * jax.random.normal(keys[1], (self.num_items, d))).at[0].set(0.0),
            "pref_embedding": nrm(0.02 * jax.random.normal(keys[2], (self.num_relations, d))).at[0].set(0.0),
            "pref_norm_embedding": nrm(0.02 * jax.random.normal(keys[3], (self.num_relations, d))).at[0].set(0.0),
        }
        tower_params = self.tower.init_params(jax.random.fold_in(rng, 9))
        params.update({k: (nrm(v) if v.ndim == 2 else v)
                       for k, v in tower_params.items()})
        return {"params": params}

    def _get_train_loaders(self, train_data, ddp=False):
        bs = self.config["train"]["batch_size"]
        return [train_data.train_loader(batch_size=bs, shuffle=True),
                _FrameLoader(train_data.network_feat[self.kg_index], bs)]

    def current_epoch_trainloaders(self, nepoch):
        cycle = self.train_rec_step + self.train_kg_step
        if nepoch % cycle < self.train_rec_step:
            return [self.trainloaders[0]], False
        return [self.trainloaders[1]], False

    def _supports_scan_epoch(self, train_data):
        return False

    # -- preference induction ------------------------------------------------
    def _pref_tables(self, params):
        pr = (params["pref_embedding"][1:] + params["rel_embedding"][1:]) / 2.0
        pn = (params["pref_norm_embedding"][1:] + params["norm_embedding"][1:]) / 2.0
        return pr, pn

    def _get_preferences(self, params, rng, user_e, item_e, training):
        pr, pn = self._pref_tables(params)
        logits = (user_e + item_e) @ pr.T
        if self.use_st_gumbel and training:
            g = -jnp.log(-jnp.log(jax.random.uniform(rng, logits.shape) + 1e-20) + 1e-20)
            y = jax.nn.softmax(logits + g, axis=-1)
            y_hard = jax.nn.one_hot(jnp.argmax(y, -1), y.shape[-1], dtype=y.dtype)
            probs = jax.lax.stop_gradient(y_hard - y) + y
        else:
            probs = jax.nn.softmax(logits, axis=-1)
        r_e = probs @ pr
        norm = probs @ pn
        return probs, r_e, norm

    @staticmethod
    def _proj(x, norm):
        return x - jnp.sum(x * norm, axis=-1, keepdims=True) * norm

    def _item_vec(self, params, ids):
        return params["item_embedding"][ids] + params["ent_embedding"][ids]

    # -- training --------------------------------------------------------
    def training_step(self, params, batch, rng, states):
        if self.fhid in batch:  # KG phase
            scores = self.tower.triplet_scores(params, rng, batch[self.fhid],
                                               batch[self.frid], batch[self.ftid],
                                               self.neg_count)
            orth = self.tower.orthogonal_loss(params, batch[self.frid])
            return self.kg_loss_fn(None, **scores) + orth
        # rec phase
        r_samp, r_g1, r_g2 = jax.random.split(rng, 3)
        query = params["user_embedding"][batch[self.fuid]]
        log_pos, neg_ids, log_neg = self.sampler(
            (), r_samp, jax.lax.stop_gradient(query), self.neg_count,
            pos_items=batch[self.fiid])
        pos_i = self._item_vec(params, batch[self.fiid])
        neg_i = self._item_vec(params, neg_ids)
        _, pos_r, pos_n = self._get_preferences(params, r_g1, query, pos_i, True)
        _, neg_r, neg_n = self._get_preferences(params, r_g2, query[:, None, :],
                                                neg_i, True)
        pos_score = self.score_func(self._proj(query, pos_n) + pos_r,
                                    self._proj(pos_i, pos_n))
        neg_score = self.score_func(self._proj(query[:, None, :], neg_n) + neg_r,
                                    self._proj(neg_i, neg_n))
        loss = self.loss_fn(None, pos_score, log_pos, neg_score, log_neg)
        pr = params["pref_embedding"][1:]
        pn = params["pref_norm_embedding"][1:]
        orth = jnp.sum(jnp.sum(pn * pr, axis=1) ** 2 / jnp.sum(pr ** 2, axis=1))
        return loss + orth

    # -- evaluation: per-item preference projection ------------------------
    def _compute_item_vector(self, params):
        return self._item_vec(params, jnp.arange(1, self.num_items))

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        item_all = states.get("item_vector")
        if item_all is None:
            item_all = self._compute_item_vector(params)
        query = params["user_embedding"][batch[self.fuid]]          # [B, D]
        u = query[:, None, :]                                        # [B, 1, D]
        items = item_all[None, :, :]                                 # [1, N-1, D]
        _, r_e, norm = self._get_preferences(params, None, u, items, False)
        scores = self.score_func(self._proj(u, norm) + r_e, self._proj(items, norm))
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items
