"""NPE: neural personalized embedding.

Reference: recstudio/model/seq/npe.py — item tower = Embedding + ReLU; query =
relu(dropout(sum of history item embeddings)) + relu(dropout(user embedding)),
sharing the raw item table with the item tower.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BinaryCrossEntropyLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class NPEItemEncoder(nn.Module):
    num_items: int
    embed_dim: int

    def setup(self):
        self.embedding_layer = Embedding(self.num_items, self.embed_dim)

    def embed(self, ids, training: bool = False):
        """Raw table lookup without the ReLU (used by the query tower)."""
        return self.embedding_layer(ids)

    def __call__(self, ids, training: bool = False):
        return jax.nn.relu(self.embedding_layer(ids))


class NPEQueryEncoder(nn.Module):
    fuid: str
    fiid: str
    num_users: int
    embed_dim: int
    dropout_rate: float
    item_encoder: NPEItemEncoder

    @nn.compact
    def __call__(self, batch, training: bool = False):
        hist_emb = self.item_encoder.embed(batch["in_" + self.fiid])
        h = jax.nn.relu(hist_emb.sum(1))
        u = jax.nn.relu(Embedding(self.num_users, self.embed_dim,
                                  name="user_embedding")(batch[self.fuid]))
        if self.dropout_rate > 0:
            drop = nn.Dropout(self.dropout_rate, deterministic=not training)
            h, u = drop(h), drop(u)
        return h + u


class NPE(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return NPEItemEncoder(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return NPEQueryEncoder(fuid=self.fuid, fiid=self.fiid,
                               num_users=train_data.num_users,
                               embed_dim=self.embed_dim,
                               dropout_rate=self.config["model"]["dropout_rate"],
                               item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()

