"""STAMP: short-term attention/memory priority model.

Reference: recstudio/model/seq/stamp.py.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import SoftmaxLoss
from ..module import AttentionLayer, Embedding, MLPModule, SeqPoolingLayer
from ..scorer import InnerProductScorer


class STAMPQueryEncoder(nn.Module):
    fiid: str
    embed_dim: int
    item_encoder: Any

    @nn.compact
    def __call__(self, batch, training: bool = False):
        hist = batch["in_" + self.fiid]
        seq_emb = self.item_encoder(hist)
        m_t = SeqPoolingLayer(pooling_type="last")(seq_emb, batch["seqlen"])
        m_s = seq_emb.sum(1) / jnp.maximum(batch["seqlen"], 1)[:, None]
        query = jnp.concatenate([m_t, m_s], axis=-1)
        m_a = AttentionLayer(q_dim=2 * self.embed_dim, k_dim=self.embed_dim,
                             mlp_layers=[self.embed_dim], name="attn")(
            query[:, None, :], seq_emb, seq_emb,
            key_padding_mask=hist == 0).squeeze(1)
        h_s = MLPModule([self.embed_dim, self.embed_dim],
                        activation_func="tanh", name="mlpA")(m_a)
        h_t = MLPModule([self.embed_dim, self.embed_dim],
                        activation_func="tanh", name="mlpB")(m_t)
        return h_s * h_t


class STAMP(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return STAMPQueryEncoder(fiid=self.fiid, embed_dim=self.embed_dim,
                                 item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return SoftmaxLoss()

    def _get_sampler(self, train_data):
        return None
