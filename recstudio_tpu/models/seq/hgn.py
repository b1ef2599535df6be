"""HGN: hierarchical gating networks.

Reference: recstudio/model/seq/hgn.py — feature gate + instance gate + item-
item sum module. (The reference's `_get_scorer_func` is a misnamed hook, so it
effectively scores with the default InnerProductScorer; behavior kept.)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class HGNQueryEncoder(nn.Module):
    fuid: str
    fiid: str
    num_users: int
    embed_dim: int
    max_seq_len: int
    item_encoder: Any
    pooling_type: str = "mean"

    @nn.compact
    def __call__(self, batch, training: bool = False):
        U = Embedding(self.num_users, self.embed_dim, name="user_embedding")(
            batch[self.fuid])
        S = self.item_encoder(batch["in_" + self.fiid])       # [B, L, D]
        L = S.shape[1]
        b_g = self.param("b_g", nn.initializers.zeros, (self.embed_dim,))
        gate_f = jax.nn.sigmoid(
            nn.Dense(self.embed_dim, use_bias=False, name="W_g_1")(S)
            + nn.Dense(self.embed_dim, use_bias=False, name="W_g_2")(U)[:, None, :]
            + b_g)
        S_F = S * gate_f
        W_g_4 = self.param("W_g_4", nn.initializers.xavier_normal(),
                           (self.max_seq_len, self.embed_dim))
        b_g_4 = self.param("b_g_4", nn.initializers.zeros, (self.max_seq_len,))
        inst_logit = (U @ W_g_4[:L].T + b_g_4[:L])[:, :, None]
        weight = jax.nn.sigmoid(
            nn.Dense(1, use_bias=False, name="w_g_3")(S_F) + inst_logit)  # [B, L, 1]
        S_I = S_F * weight
        if self.pooling_type == "mean":
            s = S_I.sum(1) / jnp.maximum(weight.sum(1), 1e-8)
        elif self.pooling_type == "max":
            s = S_I.max(1)
        else:
            raise ValueError("pooling_type must be mean or max")
        return U + s + S.sum(1)


class HGN(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return HGNQueryEncoder(fuid=self.fuid, fiid=self.fiid,
                               num_users=train_data.num_users,
                               embed_dim=self.embed_dim,
                               max_seq_len=train_data.config["max_seq_len"],
                               item_encoder=self.item_encoder,
                               pooling_type=self.config["model"]["pooling_type"])

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BPRLoss()

