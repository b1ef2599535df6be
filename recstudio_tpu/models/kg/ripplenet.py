"""RippleNet: preference propagation over per-user KG ripple sets.

Reference: recstudio/model/kg/ripplenet.py — fixed-size (n_hop x n_memory)
triple sets are sampled per user at build time (static shapes), and the item
representation attends over each hop's relation-projected heads. The per-slot
relation matrices are processed one memory slot at a time to bound the
[B, M, D, D] intermediate.
"""
from __future__ import annotations

import collections

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss


class RippleNet(BaseRanker):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)
        mc = config["model"]
        self.n_hop = mc["n_hop"]
        self.n_memory = mc["n_memory"]
        self.item_update_mode = mc["item_update_mode"]
        self.using_all_hops = mc["using_all_hops"]
        self.kge_weight = mc["kge_weight"]

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
        self.fhid = train_data.get_network_field(self.kg_index, 0, 0)
        self.frid = train_data.get_network_field(self.kg_index, 0, 1)
        self.ftid = train_data.get_network_field(self.kg_index, 0, 2)
        self.num_entities = train_data.num_values(self.fhid)
        self.num_relations = train_data.num_values(self.frid)
        self._build_ripple_sets(train_data)
        super()._init_model(train_data, drop_unused_field)

    def _build_ripple_sets(self, train_data):
        kg = collections.defaultdict(list)
        net = train_data.network_feat[self.kg_index]
        h_col = np.asarray(net.get_col(self.fhid))
        r_col = np.asarray(net.get_col(self.frid))
        t_col = np.asarray(net.get_col(self.ftid))
        for h, r, t in zip(h_col, r_col, t_col):
            kg[int(h)].append((int(t), int(r)))
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(train_data.fuid))[sub]
        items = np.asarray(train_data.inter_feat.get_col(train_data.fiid))[sub]
        hist = collections.defaultdict(list)
        for u, i in zip(users, items):
            hist[int(u)].append(int(i))
        U, H, M = train_data.num_users, self.n_hop, self.n_memory
        rip_h = np.zeros((H, U, M), dtype=np.int32)
        rip_r = np.zeros((H, U, M), dtype=np.int32)
        rip_t = np.zeros((H, U, M), dtype=np.int32)
        rng = np.random.default_rng(0)
        for u, seeds in hist.items():
            tails = seeds
            for h in range(H):
                mh, mr, mt = [], [], []
                for ent in tails:
                    for t, r in kg.get(int(ent), ()):
                        mh.append(int(ent)); mr.append(r); mt.append(t)
                if mh:
                    idx = rng.choice(len(mh), M, replace=len(mh) < M)
                    rip_h[h, u] = np.asarray(mh)[idx]
                    rip_r[h, u] = np.asarray(mr)[idx]
                    rip_t[h, u] = np.asarray(mt)[idx]
                elif h > 0:
                    rip_h[h, u] = rip_h[h - 1, u]
                    rip_r[h, u] = rip_r[h - 1, u]
                    rip_t[h, u] = rip_t[h - 1, u]
                tails = rip_t[h, u]
        self._rip = (jnp.asarray(rip_h), jnp.asarray(rip_r), jnp.asarray(rip_t))

    def _get_score_net(self, train_data):
        return None  # parameters managed directly

    def _init_variables(self, batch):
        rng = self.next_rng()
        k1, k2, k3 = jax.random.split(rng, 3)
        d = self.embed_dim
        params = {
            "ent_embedding": (0.02 * jax.random.normal(k1, (self.num_entities, d))).at[0].set(0.0),
            "rel_embedding": (0.02 * jax.random.normal(k2, (self.num_relations, d * d))).at[0].set(0.0),
        }
        if self.item_update_mode in ("replace_transform", "plus_transform"):
            std = (2.0 / (d + d)) ** 0.5
            params["transform"] = {"kernel": std * jax.random.normal(k3, (d, d))}
        return {"params": params}

    def _update_item(self, params, v, o):
        mode = self.item_update_mode
        if mode == "replace":
            return o
        if mode == "plus":
            return v + o
        W = params["transform"]["kernel"]
        if mode == "replace_transform":
            return o @ W
        return (v + o) @ W  # plus_transform

    def score(self, params, batch, training: bool = False, rng=None,
              net_state=None, return_kge: bool = False):
        d = self.embed_dim
        uid, iid = batch[self.fuid], batch[self.fiid]
        rip_h, rip_r, rip_t = self._rip
        v = params["ent_embedding"][iid]                              # [B, D]
        o_list = []
        kge = 0.0
        for h in range(self.n_hop):
            h_e = params["ent_embedding"][rip_h[h][uid]]              # [B, M, D]
            t_e = params["ent_embedding"][rip_t[h][uid]]
            probs_logits = []
            Rh_slots = []
            for m in range(self.n_memory):                            # bound memory
                R = params["rel_embedding"][rip_r[h][uid][:, m]].reshape(-1, d, d)
                Rh = jnp.einsum("bij,bj->bi", R, h_e[:, m])           # [B, D]
                Rh_slots.append(Rh)
                if return_kge:
                    kge = kge + jnp.mean(jax.nn.sigmoid(
                        jnp.sum(t_e[:, m] * Rh, -1))) / self.n_memory
            Rh = jnp.stack(Rh_slots, axis=1)                          # [B, M, D]
            probs = jax.nn.softmax(jnp.sum(Rh * v[:, None, :], -1), axis=-1)
            o = jnp.sum(probs[..., None] * t_e, axis=1)               # [B, D]
            v = self._update_item(params, v, o)
            o_list.append(o)
        y = sum(o_list) if self.using_all_hops else o_list[-1]
        scores = jnp.sum(v * y, -1)
        if return_kge:
            return scores, kge
        return scores

    def training_step(self, params, batch, rng, states):
        scores, kge = self.score(params, batch, training=True, return_kge=True)
        loss = self.loss_fn(batch[self.frating], scores)
        return loss - self.kge_weight * kge
