"""TransRec: translation-based recommendation.

Reference: recstudio/model/seq/transrec.py — query = (local + global) user
translation vector + last item embedding. (The reference's `_get_scorer` is a
misnamed hook, so it effectively scores with the default InnerProductScorer;
behavior kept.)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class TransRecQueryEncoder(nn.Module):
    fuid: str
    fiid: str
    num_users: int
    embed_dim: int
    item_encoder: Any

    @nn.compact
    def __call__(self, batch, training: bool = False):
        hist = batch["in_" + self.fiid]
        local_u = Embedding(self.num_users, self.embed_dim, name="user_embedding")(
            batch[self.fuid])
        global_u = self.param("global_user_emb", nn.initializers.zeros,
                              (self.embed_dim,))
        u = local_u + global_u[None, :]
        last_idx = jnp.maximum(batch["seqlen"] - 1, 0)
        last_item = jnp.take_along_axis(hist, last_idx[:, None], axis=1)
        last_emb = self.item_encoder(last_item).squeeze(1)
        return u + last_emb


class TransRec(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return TransRecQueryEncoder(fuid=self.fuid, fiid=self.fiid,
                                    num_users=train_data.num_users,
                                    embed_dim=self.embed_dim,
                                    item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BPRLoss()

