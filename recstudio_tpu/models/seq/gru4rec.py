"""GRU4Rec: session-based RNN recommender.

Reference: recstudio/model/seq/gru4rec.py (item-embedding sequence -> dropout
-> GRU stack -> last-state pooling -> linear projection back to embed_dim).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding, GRULayer, SeqPoolingLayer
from ..scorer import InnerProductScorer


class GRUQueryEncoder(nn.Module):
    fiid: str
    embed_dim: int
    hidden_size: int
    layer_num: int
    dropout: float
    item_encoder: Any

    @nn.compact
    def __call__(self, batch, training: bool = False):
        seq_embs = self.item_encoder(batch["in_" + self.fiid])
        if self.dropout > 0:
            seq_embs = nn.Dropout(self.dropout, deterministic=not training)(seq_embs)
        gru_out = GRULayer(self.embed_dim, self.hidden_size,
                           self.layer_num, name="gru")(seq_embs, training=training)
        last = SeqPoolingLayer(pooling_type="last")(gru_out, batch["seqlen"])
        return nn.Dense(self.embed_dim, name="proj")(last)


class GRU4Rec(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return GRUQueryEncoder(
            fiid=self.fiid, embed_dim=self.embed_dim, hidden_size=mc["hidden_size"],
            layer_num=mc["layer_num"], dropout=mc["dropout_rate"],
            item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BPRLoss()

