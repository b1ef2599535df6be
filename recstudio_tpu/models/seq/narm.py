"""NARM: neural attentive session-based recommendation.

Reference: recstudio/model/seq/narm.py (GRU global encoder + additive
attention local encoder, bi-linear projection, full SoftmaxLoss).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import SoftmaxLoss
from ..module import AttentionLayer, Embedding, GRULayer, SeqPoolingLayer
from ..scorer import InnerProductScorer


class NARMQueryEncoder(nn.Module):
    fiid: str
    embed_dim: int
    hidden_size: int
    layer_num: int
    dropout_rate: Sequence[float]
    item_encoder: Any

    @nn.compact
    def __call__(self, batch, training: bool = False):
        hist = batch["in_" + self.fiid]
        x = self.item_encoder(hist)
        if self.dropout_rate[0] > 0:
            x = nn.Dropout(self.dropout_rate[0], deterministic=not training)(x)
        gru_vec = GRULayer(self.embed_dim, self.hidden_size, self.layer_num,
                           name="gru")(x, training=training)
        h_t = SeqPoolingLayer(pooling_type="last")(gru_vec, batch["seqlen"])
        c_local = AttentionLayer(q_dim=self.hidden_size,
                                 mlp_layers=[self.hidden_size], bias=False,
                                 name="attn")(
            h_t[:, None, :], gru_vec, gru_vec,
            key_padding_mask=hist == 0).squeeze(1)
        c = jnp.concatenate([h_t, c_local], axis=-1)
        if self.dropout_rate[1] > 0:
            c = nn.Dropout(self.dropout_rate[1], deterministic=not training)(c)
        return nn.Dense(self.embed_dim, use_bias=False, name="fc")(c)


class NARM(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return NARMQueryEncoder(fiid=self.fiid, embed_dim=self.embed_dim,
                                hidden_size=mc["hidden_size"],
                                layer_num=mc["layer_num"],
                                dropout_rate=mc["dropout_rate"],
                                item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return SoftmaxLoss()

    def _get_sampler(self, train_data):
        return None
