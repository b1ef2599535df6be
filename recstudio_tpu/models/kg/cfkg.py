"""CFKG: collaborative filtering on a user-item-entity knowledge graph.

Reference: recstudio/model/kg/cfkg.py — user-item interactions become
(user, interact, item) triplets in the KG; TransE-style translation with
corrupt-head and corrupt-tail hinge losses. The rec batch and a KG-triple
batch are zipped per step (reference CombinedLoaders), here merged into one
batch dict by a zip loader.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ann.sampler import UniformSampler
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import HingeLoss
from ..scorer import NormScorer


class _ZipLoader:
    """Zip several loaders, merging their batch dicts (reference
    CombinedLoaders, data/dataset.py:1812-1835)."""

    def __init__(self, loaders):
        self.loaders = loaders

    def __len__(self):
        return min(len(l) for l in self.loaders)

    def __iter__(self):
        for batches in zip(*self.loaders):
            merged = {}
            for b in batches:
                merged.update(b)
            yield merged


class CFKG(BaseRetriever):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _set_data_field(self, data):
        fhid = data.get_network_field(self.kg_index, 0, 0)
        frid = data.get_network_field(self.kg_index, 0, 1)
        ftid = data.get_network_field(self.kg_index, 0, 2)
        data.use_field = {data.fuid, data.fiid, data.frating, fhid, frid, ftid}

    def _init_model(self, train_data, drop_unused_field: bool = True):
        from ..basemodel.recommender import Recommender
        Recommender._init_model(self, train_data, drop_unused_field)
        self.num_users = train_data.num_users
        self.num_items = train_data.num_items
        self.fhid = train_data.get_network_field(self.kg_index, 0, 0)
        self.frid = train_data.get_network_field(self.kg_index, 0, 1)
        self.ftid = train_data.get_network_field(self.kg_index, 0, 2)
        self.num_entities = train_data.num_values(self.fhid)
        self.num_relations = train_data.num_values(self.frid)
        self.query_fields = {self.fuid}
        self.item_fields = {self.fiid}
        self._item_feat_arrays = None
        self.net = None
        self.score_func = NormScorer(2)
        self.sampler = UniformSampler(self.num_items)
        self.kg_sampler = UniformSampler(self.num_entities)
        self.user_sampler = UniformSampler(self.num_users)

    def _get_loss_func(self):
        return HingeLoss(self.config["model"]["margin"])

    def _init_variables(self, batch):
        rng = self.next_rng()
        k1, k2, k3 = jax.random.split(rng, 3)
        d = self.embed_dim
        return {"params": {
            # entity table covers items + KG entities (shared id space)
            "ent_embedding": (0.02 * jax.random.normal(k1, (self.num_entities, d))).at[0].set(0.0),
            # one extra row: the synthetic 'interact' relation
            "rel_embedding": (0.02 * jax.random.normal(k2, (self.num_relations + 1, d))).at[0].set(0.0),
            "user_embedding": (0.02 * jax.random.normal(k3, (self.num_users, d))).at[0].set(0.0),
        }}

    def _get_train_loaders(self, train_data, ddp=False):
        bs = self.config["train"]["batch_size"]
        rec = train_data.train_loader(batch_size=bs, shuffle=True)
        kg = _FrameLoader(train_data.network_feat[self.kg_index], bs)
        return [_ZipLoader([rec, kg])]

    def _supports_scan_epoch(self, train_data):
        return False  # zipped rec+kg loader runs through the host path

    def _compute_item_vector(self, params):
        return params["ent_embedding"][1: self.num_items]

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        item_vector = states.get("item_vector")
        if item_vector is None:
            item_vector = self._compute_item_vector(params)
        query = params["user_embedding"][batch[self.fuid]] \
            + params["rel_embedding"][-1]
        scores = self.score_func(query, item_vector)
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items

    def training_step(self, params, batch, rng, states):
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        user_e = params["user_embedding"][batch[self.fuid]]
        item_e = params["ent_embedding"][batch[self.fiid]]
        inter_e = jnp.broadcast_to(params["rel_embedding"][-1], user_e.shape)
        h_e = params["ent_embedding"][batch[self.fhid]]
        t_e = params["ent_embedding"][batch[self.ftid]]
        r_e = params["rel_embedding"][batch[self.frid]]

        pos_i_p, neg_i, neg_i_p = self.sampler((), r1, user_e, self.neg_count,
                                               pos_items=batch[self.fiid])
        pos_t_p, neg_t, neg_t_p = self.kg_sampler((), r2, h_e, self.neg_count,
                                                  pos_items=batch[self.ftid])
        pos_u_p, neg_u, neg_u_p = self.user_sampler((), r3, item_e, self.neg_count,
                                                    pos_items=batch[self.fuid])
        pos_h_p, neg_h, neg_h_p = self.kg_sampler((), r4, t_e, self.neg_count,
                                                  pos_items=batch[self.fhid])
        neg_item_e = params["ent_embedding"][neg_i]
        neg_t_e = params["ent_embedding"][neg_t]
        neg_user_e = params["user_embedding"][neg_u]
        neg_h_e = params["ent_embedding"][neg_h]

        # corrupt tail
        query = jnp.concatenate([user_e, h_e]) + jnp.concatenate([inter_e, r_e])
        pos = jnp.concatenate([item_e, t_e])
        neg = jnp.concatenate([neg_item_e, neg_t_e])
        tail = {"pos_score": self.score_func(query, pos),
                "log_pos_prob": jnp.concatenate([pos_i_p, pos_t_p]),
                "neg_score": self.score_func(query, neg),
                "log_neg_prob": jnp.concatenate([neg_i_p, neg_t_p])}
        # corrupt head
        query2 = jnp.concatenate([item_e, t_e])
        pos2 = jnp.concatenate([user_e, h_e]) + jnp.concatenate([inter_e, r_e])
        neg2 = jnp.concatenate([neg_user_e, neg_h_e]) \
            + jnp.concatenate([inter_e, r_e])[:, None, :]
        head = {"pos_score": self.score_func(query2, pos2),
                "log_pos_prob": jnp.concatenate([pos_u_p, pos_h_p]),
                "neg_score": self.score_func(query2, neg2),
                "log_neg_prob": jnp.concatenate([neg_u_p, neg_h_p])}
        return self.loss_fn(None, **tail) + self.loss_fn(None, **head)


class _FrameLoader:
    """Fixed-shape batch iterator over a Frame (network feats)."""

    def __init__(self, frame, batch_size, shuffle=True):
        self.frame = frame
        self.batch_size = batch_size
        self.shuffle = shuffle

    def __len__(self):
        return -(-len(self.frame) // self.batch_size)

    def __iter__(self):
        n = len(self.frame)
        order = np.random.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        for s in range(0, n, bs):
            idx = order[s:s + bs]
            if len(idx) < bs:
                idx = np.concatenate([idx, order[: bs - len(idx)]])
            yield self.frame[idx]
