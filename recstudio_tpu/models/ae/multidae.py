"""MultiDAE: denoising autoencoder over user interaction vectors.

Reference: recstudio/model/ae/multidae.py (sqrt-normalized bag-of-items
embedding -> MLP encoder/decoder -> full SoftmaxLoss on UserDataset).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import UserDataset
from ..basemodel import BaseRetriever
from ..loss_func import SoftmaxLoss
from ..module import Embedding, MLPModule
from ..scorer import InnerProductScorer


class MultiDAEQueryEncoder(nn.Module):
    fiid: str
    num_items: int
    embed_dim: int
    dropout_rate: float
    encoder_dims: Sequence[int]
    decoder_dims: Sequence[int]
    activation: str = "relu"

    @nn.compact
    def __call__(self, batch, training: bool = False):
        assert self.encoder_dims[-1] == self.decoder_dims[0]
        assert self.encoder_dims[0] == self.decoder_dims[-1]
        hist = batch["in_" + self.fiid]
        seq_emb = Embedding(self.num_items, self.embed_dim,
                            name="item_embedding")(hist)
        nnz = jnp.maximum((hist != 0).sum(-1, keepdims=True), 1).astype(jnp.float32)
        h = seq_emb.sum(1) / jnp.sqrt(nnz)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=not training)(h)
        h = MLPModule([self.embed_dim, *self.encoder_dims, *self.decoder_dims[1:]],
                      activation_func=self.activation, name="encoder_decoder")(h)
        return nn.Dense(self.embed_dim, name="out_proj")(h)


class MultiDAE(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return UserDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return MultiDAEQueryEncoder(fiid=self.fiid, num_items=train_data.num_items,
                                    embed_dim=self.embed_dim,
                                    dropout_rate=mc["dropout"],
                                    encoder_dims=mc["encoder_dims"],
                                    decoder_dims=mc["decoder_dims"],
                                    activation=mc["activation"])

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_sampler(self, train_data):
        return None

    def _get_loss_func(self):
        return SoftmaxLoss()
