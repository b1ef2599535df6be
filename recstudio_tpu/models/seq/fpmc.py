"""FPMC: factorized personalized Markov chains.

Reference: recstudio/model/seq/fpmc.py — item tower is a 2D-wide embedding;
query = concat(user embedding, last-item embedding).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding, SeqPoolingLayer
from ..scorer import InnerProductScorer


class FPMCQueryEncoder(nn.Module):
    fuid: str
    fiid: str
    num_users: int
    num_items: int
    embed_dim: int

    @nn.compact
    def __call__(self, batch, training: bool = False):
        u = Embedding(self.num_users, self.embed_dim, name="user_embedding")(batch[self.fuid])
        seq_emb = Embedding(self.num_items, self.embed_dim, name="last_item_embedding")(
            batch["in_" + self.fiid])
        last = SeqPoolingLayer(pooling_type="last")(seq_emb, batch["seqlen"])
        return jnp.concatenate([u, last], axis=-1)


class FPMC(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, 2 * self.embed_dim)

    def _get_query_encoder(self, train_data):
        return FPMCQueryEncoder(fuid=self.fuid, fiid=self.fiid,
                                num_users=train_data.num_users,
                                num_items=train_data.num_items,
                                embed_dim=self.embed_dim)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BPRLoss()

