"""MKR: multi-task feature learning with cross&compress units.

Reference: recstudio/model/kg/mkr.py — item and entity embeddings exchanged
through L cross&compress units; rec phase uses the item stream, KG phase the
entity stream; KG epochs interleave every `kge_interval` epochs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ann.sampler import UniformSampler
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BinaryCrossEntropyLoss
from ..module import CrossCompressUnit, Embedding, MLPModule
from ..scorer import InnerProductScorer
from .cfkg import _FrameLoader


class MKRNet(nn.Module):
    num_users: int
    num_entities: int
    num_relations: int
    embed_dim: int
    L: int
    H: int

    def setup(self):
        d = self.embed_dim
        self.user_embedding = Embedding(self.num_users, d)
        self.item_embedding = Embedding(self.num_entities, d)
        self.ent_embedding = Embedding(self.num_entities, d)
        self.rel_embedding = Embedding(self.num_relations, d)
        self.cc_units = [CrossCompressUnit(d, name=f"cc_{i}") for i in range(self.L)]
        self.user_mlp = MLPModule([d] * (self.L + 1))
        self.rel_mlp = MLPModule([d] * (self.L + 1))
        self.kge_mlp = MLPModule([2 * d] * self.H + [d])
        self.scorer = InnerProductScorer()

    def _cross(self, ids):
        shape = ids.shape
        flat = ids.reshape(-1)
        v = self.item_embedding(flat)
        e = self.ent_embedding(flat)
        for cc in self.cc_units:
            v, e = cc(v, e)
        d = v.shape[-1]
        return v.reshape(*shape, d), e.reshape(*shape, d)

    def encode_query(self, uid, training: bool = False):
        return self.user_mlp(self.user_embedding(uid))

    def encode_item(self, ids, training: bool = False):
        return self._cross(ids)[0]

    def score(self, query, items):
        return self.scorer(query, items)

    def kg_score(self, heads, relations, tails, training: bool = False):
        h_e = self._cross(heads)[1]
        r_e = self.rel_mlp(self.rel_embedding(relations))
        t_e = self.ent_embedding(tails)
        tail_pred = jax.nn.sigmoid(
            self.kge_mlp(jnp.concatenate([h_e, r_e], axis=-1)))
        return jax.nn.sigmoid(self.scorer(tail_pred, t_e))

    def __call__(self, uid, iid, training: bool = False):
        q = self.encode_query(uid, training)
        v = self.encode_item(iid, training)
        return self.score(q, v)


class MKR(BaseRetriever):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)
        mc = config["model"]
        self.L, self.H = mc["L"], mc["H"]
        self.kge_interval = mc["kge_interval"]

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
        self.score_func = InnerProductScorer()
        self.sampler = UniformSampler(self.num_items)
        self.net = MKRNet(self.num_users, self.num_entities, self.num_relations,
                          self.embed_dim, self.L, self.H)

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()

    def _init_variables(self, batch):
        uid = jnp.asarray(batch[self.fuid])[:2] if self.fuid in batch \
            else jnp.zeros(2, jnp.int32)
        iid = jnp.asarray(batch[self.fiid])[:2]
        variables = self.net.init(
            {"params": self.next_rng()}, uid, iid, training=False)
        # also trace the kg branch so its params exist
        kg_vars = self.net.init(
            {"params": self.next_rng()},
            jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
            jnp.zeros(2, jnp.int32), training=False, method=self.net.kg_score)
        merged = jax.tree_util.tree_map(
            lambda a: a, {**kg_vars["params"], **variables["params"]})
        return {"params": merged}

    def _get_train_loaders(self, train_data, ddp=False):
        bs = self.config["train"]["batch_size"]
        return [train_data.train_loader(batch_size=bs, shuffle=True),
                _FrameLoader(train_data.network_feat[self.kg_index], bs)]

    def current_epoch_trainloaders(self, nepoch):
        if (nepoch + 1) % self.kge_interval == 0:
            return list(self.trainloaders), False
        return [self.trainloaders[0]], False

    def _supports_scan_epoch(self, train_data):
        return False

    def _get_query_feat(self, data):
        return data[self.fuid]

    def training_step(self, params, batch, rng, states):
        if self.fhid in batch:  # KG phase: maximize sigmoid tail agreement
            score = self.net.apply({"params": params}, batch[self.fhid],
                                   batch[self.frid], batch[self.ftid],
                                   method=self.net.kg_score)
            return -score.sum()
        return super().training_step(params, batch, rng, states)
