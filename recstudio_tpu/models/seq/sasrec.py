"""SASRec: self-attentive sequential recommendation.

Reference: recstudio/model/seq/sasrec.py:8-123 (shared SASRecQueryEncoder —
causal/bidirectional transformer over the item-embedding sequence with
learned positions; reused by BERT4Rec/CL4SRec-family models).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BinaryCrossEntropyLoss
from ..module import Embedding, SeqPoolingLayer, TransformerEncoder
from ..scorer import InnerProductScorer


class SASRecQueryEncoder(nn.Module):
    fiid: str
    embed_dim: int
    max_seq_len: int
    n_head: int
    hidden_size: int
    dropout: float
    activation: str
    layer_norm_eps: float
    n_layer: int
    item_encoder: Any
    bidirectional: bool = False
    training_pooling_type: str = "last"
    eval_pooling_type: str = "last"

    @nn.compact
    def __call__(self, batch, need_pooling: bool = True, training: bool = False):
        hist = batch["in_" + self.fiid]                       # [B, L]
        B, L = hist.shape
        pos_table = self.param("pos_emb_table", nn.initializers.normal(0.02),
                               (self.max_seq_len, self.embed_dim))
        position_embs = pos_table[:L][None, :, :]
        seq_embs = self.item_encoder(hist)
        pad_mask = hist == 0
        if not self.bidirectional:
            attn_mask = jnp.triu(jnp.ones((L, L), bool), 1)
        else:
            attn_mask = None
        x = seq_embs + position_embs
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        out = TransformerEncoder(
            num_layers=self.n_layer, d_model=self.embed_dim, n_head=self.n_head,
            dim_feedforward=self.hidden_size, dropout=self.dropout,
            activation=self.activation, layer_norm_eps=self.layer_norm_eps,
            name="transformer")(x, key_padding_mask=pad_mask,
                                attn_mask=attn_mask, training=training)
        if not need_pooling:
            return out
        ptype = self.training_pooling_type if training else self.eval_pooling_type
        if ptype == "origin":
            return out
        if ptype == "mask":
            # static-shape masked-position training: return every position;
            # the loss masks non-targets via -inf pos_score
            return out
        return SeqPoolingLayer(pooling_type=ptype)(out, batch["seqlen"])


class SASRec(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return SASRecQueryEncoder(
            fiid=self.fiid, embed_dim=self.embed_dim,
            max_seq_len=train_data.config["max_seq_len"], n_head=mc["head_num"],
            hidden_size=mc["hidden_size"], dropout=mc["dropout_rate"],
            activation=mc["activation"], layer_norm_eps=float(mc["layer_norm_eps"]),
            n_layer=mc["layer_num"], item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()

