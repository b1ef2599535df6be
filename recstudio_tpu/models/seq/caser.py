"""Caser: convolutional sequence embedding.

Reference: recstudio/model/seq/caser.py — vertical (time-collapsing) and
horizontal (per-window-width) convolutions over the embedded sequence image.
The per-width horizontal filters are expressed as `lax.conv_general_dilated`
over the embedding-channel axis (MXU-friendly), one VALID conv per width.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class CaserQueryEncoder(nn.Module):
    fuid: str
    fiid: str
    num_users: int
    num_items: int
    embed_dim: int
    max_seq_len: int
    n_v: int
    n_h: int
    dropout: float = 0.2

    @nn.compact
    def __call__(self, batch, training: bool = False):
        P_u = Embedding(self.num_users, self.embed_dim, name="user_embedding")(
            batch[self.fuid])
        seq = batch["in_" + self.fiid]
        L = self.max_seq_len
        if seq.shape[1] < L:
            seq = jnp.pad(seq, ((0, 0), (0, L - seq.shape[1])))
        E = Embedding(self.num_items, self.embed_dim, name="item_embedding")(seq)

        # vertical filters: kernel (L, 1) collapses time per embedding dim
        W_v = self.param("vertical_kernel", nn.initializers.xavier_normal(),
                         (self.n_v, L))
        b_v = self.param("vertical_bias", nn.initializers.zeros, (self.n_v,))
        o_v = jnp.einsum("bld,vl->bvd", E, W_v) + b_v[None, :, None]
        o_v = o_v.reshape(E.shape[0], -1)

        # horizontal filters: one VALID conv per window width h=1..L,
        # relu + max-pool over time
        o_h = []
        for h in range(1, L + 1):
            W_h = self.param(f"horizontal_kernel_{h}",
                             nn.initializers.xavier_normal(),
                             (h, self.embed_dim, self.n_h))
            b_h = self.param(f"horizontal_bias_{h}", nn.initializers.zeros,
                             (self.n_h,))
            conv = jax.lax.conv_general_dilated(
                E, W_h, window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC")) + b_h
            o_h.append(jax.nn.relu(conv).max(axis=1))
        o = jnp.concatenate([o_v] + o_h, axis=1)
        if self.dropout > 0:
            o = nn.Dropout(self.dropout, deterministic=not training)(o)
        z = jax.nn.relu(nn.Dense(self.embed_dim, name="fc")(o))
        return jnp.concatenate([z, P_u], axis=1)


class Caser(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim * 2)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return CaserQueryEncoder(
            fuid=self.fuid, fiid=self.fiid, num_users=train_data.num_users,
            num_items=train_data.num_items, embed_dim=self.embed_dim,
            max_seq_len=train_data.config["max_seq_len"],
            n_v=mc["n_v"], n_h=mc["n_h"], dropout=mc["dropout"])

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BPRLoss()

