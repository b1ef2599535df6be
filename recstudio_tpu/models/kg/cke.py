"""CKE: collaborative knowledge-base embedding.

Reference: recstudio/model/kg/cke.py — MF retriever whose item representation
is item_emb + TransR entity embedding (entities aliased to item ids), trained
jointly with a TransR triplet objective on zipped rec/KG batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ann.sampler import UniformSampler
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..scorer import InnerProductScorer
from .cfkg import _FrameLoader, _ZipLoader
from .kglearning import TransRTower


class _CKETransR(TransRTower):
    pass  # BPR triplet loss applied by the parent


class CKE(BaseRetriever):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)

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
        self.tower = _CKETransR(self.config, self.num_entities, self.num_relations)
        self.kg_loss_fn = BPRLoss()

    def _get_loss_func(self):
        return BPRLoss()

    def _init_variables(self, batch):
        rng = self.next_rng()
        k1, k2, k3 = jax.random.split(rng, 3)
        d = self.embed_dim
        params = {
            "user_embedding": (0.02 * jax.random.normal(k1, (self.num_users, d))).at[0].set(0.0),
            "item_embedding": (0.02 * jax.random.normal(k2, (self.num_items, d))).at[0].set(0.0),
        }
        params.update(self.tower.init_params(k3))
        return {"params": params}

    def _get_train_loaders(self, train_data, ddp=False):
        bs = self.config["train"]["batch_size"]
        rec = train_data.train_loader(batch_size=bs, shuffle=True)
        kg = _FrameLoader(train_data.network_feat[self.kg_index], bs)
        return [_ZipLoader([rec, kg])]

    def _supports_scan_epoch(self, train_data):
        return False

    def _compute_item_vector(self, params):
        return params["item_embedding"][1:] \
            + params["ent_embedding"][1: self.num_items]

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        item_vector = states.get("item_vector")
        if item_vector is None:
            item_vector = self._compute_item_vector(params)
        query = params["user_embedding"][batch[self.fuid]]
        scores = self.score_func(query, item_vector)
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items

    def training_step(self, params, batch, rng, states):
        r_rec, r_kg = jax.random.split(rng)
        query = params["user_embedding"][batch[self.fuid]]
        item_vec_of = lambda ids: params["item_embedding"][ids] \
            + params["ent_embedding"][ids]
        pos_score = self.score_func(query, item_vec_of(batch[self.fiid]))
        log_pos, neg_ids, log_neg = self.sampler(
            (), r_rec, jax.lax.stop_gradient(query), self.neg_count,
            pos_items=batch[self.fiid])
        neg_score = self.score_func(query, item_vec_of(neg_ids))
        rec_loss = self.loss_fn(batch[self.frating], pos_score, log_pos,
                                neg_score, log_neg)
        kg_scores = self.tower.triplet_scores(
            params, r_kg, batch[self.fhid], batch[self.frid], batch[self.ftid],
            self.neg_count)
        return rec_loss + self.kg_loss_fn(None, **kg_scores)
