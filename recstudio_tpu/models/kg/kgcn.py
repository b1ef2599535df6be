"""KGCN: knowledge graph convolutional network (user-specific item encoding).

Reference: recstudio/model/kg/kgcn.py — each item's embedding is aggregated
from fixed-size sampled multi-hop KG neighborhoods, with relation weights
personalized by the user embedding. The fixed neighbor fan-out makes every
hop a static-shape gather — ideal for XLA.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import Embedding, get_act


class KGCNNet(nn.Module):
    num_users: int
    num_entities: int
    num_relations: int
    embed_dim: int
    n_iter: int
    n_neighbor: int
    aggregator_type: str = "sum"

    def setup(self):
        d = self.embed_dim
        self.user_embedding = Embedding(self.num_users, d)
        self.ent_embedding = Embedding(self.num_entities, d)
        self.rel_embedding = Embedding(self.num_relations, d)
        self.agg_dense = [nn.Dense(d, name=f"agg_{i}") for i in range(self.n_iter)]

    def _aggregate(self, i, self_vec, neigh_vec, last: bool):
        if self.aggregator_type == "sum":
            x = self_vec + neigh_vec
        elif self.aggregator_type == "neighbor":
            x = neigh_vec
        else:  # concat -> project back to d (GraphSage-style)
            x = self_vec + neigh_vec
        act = jnp.tanh if last else jax.nn.relu
        return act(self.agg_dense[i](x))

    def __call__(self, uid, entities, relations, training: bool = False):
        """entities: list of [B, K^h] hop neighborhoods; relations likewise."""
        u = self.user_embedding(uid)                                  # [B, D]
        ent_vecs = [self.ent_embedding(e) for e in entities]
        rel_vecs = [self.rel_embedding(r) for r in relations]
        d, K = self.embed_dim, self.n_neighbor
        for i in range(self.n_iter):
            nxt = []
            for hop in range(self.n_iter - i):
                B = ent_vecs[hop].shape[0]
                neigh = ent_vecs[hop + 1].reshape(B, -1, K, d)
                rel = rel_vecs[hop].reshape(B, -1, K, d)
                score = jnp.mean(rel * u[:, None, None, :], axis=-1)   # [B, m, K]
                w = jax.nn.softmax(score, axis=-1)[..., None]
                agg = jnp.mean(w * neigh, axis=-2)                     # [B, m, D]
                self_vec = ent_vecs[hop].reshape(B, -1, d)
                nxt.append(self._aggregate(i, self_vec, agg,
                                           i == self.n_iter - 1).reshape(
                    ent_vecs[hop].shape[:-1] + (d,)))
            ent_vecs = nxt
        item_emb = ent_vecs[0].reshape(-1, d)                          # [B, D]
        return (u * item_emb).sum(-1)


class KGCN(BaseRanker):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.kg_index = config["data"].get("kg_network_index", 1)
        mc = config["model"]
        self.n_iter = mc["n_iter"]
        self.n_neighbor = mc["neighbor_sample_size"]

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
        self._build_adj(train_data)
        super()._init_model(train_data, drop_unused_field)

    def _build_adj(self, train_data):
        """Fixed-fanout sampled adjacency [E, K] (reference _construct_adj)."""
        kg = train_data.network_feat[self.kg_index]
        h = np.asarray(kg.get_col(self.fhid))
        r = np.asarray(kg.get_col(self.frid))
        t = np.asarray(kg.get_col(self.ftid))
        # treat triples as undirected for neighborhood construction
        heads = np.concatenate([h, t])
        tails = np.concatenate([t, h])
        rels = np.concatenate([r, r])
        rng = np.random.default_rng(0)
        E, K = self.num_entities, self.n_neighbor
        adj_e = np.zeros((E, K), dtype=np.int32)
        adj_r = np.zeros((E, K), dtype=np.int32)
        order = np.argsort(heads, kind="stable")
        hs, ts, rs = heads[order], tails[order], rels[order]
        bounds = np.searchsorted(hs, np.arange(E + 1))
        for e in range(E):
            lo, hi = bounds[e], bounds[e + 1]
            if hi > lo:
                idx = rng.integers(lo, hi, K)
                adj_e[e] = ts[idx]
                adj_r[e] = rs[idx]
        self._adj_e = jnp.asarray(adj_e)
        self._adj_r = jnp.asarray(adj_r)

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return KGCNNet(train_data.num_users, self.num_entities,
                       self.num_relations, self.embed_dim, self.n_iter,
                       self.n_neighbor, mc.get("aggregator_type", "sum"))

    def _hops(self, iids):
        entities = [iids[:, None]]
        relations = []
        for _ in range(self.n_iter):
            prev = entities[-1].reshape(iids.shape[0], -1)
            entities.append(self._adj_e[prev].reshape(iids.shape[0], -1))
            relations.append(self._adj_r[prev].reshape(iids.shape[0], -1))
        return entities, relations

    def _init_variables(self, batch):
        iid = jnp.asarray(batch[self.fiid])[:2]
        uid = jnp.asarray(batch[self.fuid])[:2]
        ents, rels = self._hops(iid)
        return self.net.init({"params": self.next_rng()}, uid, ents, rels,
                             training=False)

    def score(self, params, batch, training: bool = False, rng=None,
              net_state=None):
        ents, rels = self._hops(batch[self.fiid])
        rngs = {"dropout": rng} if (rng is not None and training) else None
        return self.net.apply({"params": params, **(net_state or {})},
                              batch[self.fuid], ents, rels,
                              training=training, rngs=rngs)

    def _get_loss_func(self):
        return BCEWithLogitLoss()
