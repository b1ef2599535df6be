"""MultiVAE: variational autoencoder with KL annealing.

Reference: recstudio/model/ae/multivae.py. The KL term is emitted through a
flax ``sow`` collection (the functional analog of the reference's
``self.kl_loss`` side channel); the anneal coefficient advances once per epoch
(epoch * steps_per_epoch / anneal_total_step, clipped at anneal_max) — a
static-per-epoch approximation of the reference's per-step counter that keeps
the whole epoch compiled as one scan.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import UserDataset
from ..basemodel import BaseRetriever
from ..loss_func import SoftmaxLoss
from ..module import Embedding, MLPModule
from ..scorer import InnerProductScorer


class MultiVAEQueryEncoder(nn.Module):
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
        enc_in = [self.embed_dim, *self.encoder_dims[:-1]]
        h = MLPModule(enc_in, activation_func=self.activation, name="encoder")(h)
        h = nn.Dense(self.encoder_dims[-1] * 2, name="enc_out")(h)
        mu, logvar = jnp.split(h, 2, axis=-1)
        if training:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
            z = mu + eps * jnp.exp(0.5 * logvar)
            kl = -0.5 * jnp.mean(jnp.sum(1 + logvar - mu ** 2 - jnp.exp(logvar), axis=1))
            self.sow("losses", "kl_loss", kl)
        else:
            z = mu
        z = MLPModule(list(self.decoder_dims), activation_func=self.activation,
                      name="decoder")(z)
        return nn.Dense(self.embed_dim, name="out_proj")(z)


class MultiVAE(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return UserDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return MultiVAEQueryEncoder(fiid=self.fiid, num_items=train_data.num_items,
                                    embed_dim=self.embed_dim,
                                    dropout_rate=mc["dropout_rate"],
                                    encoder_dims=mc["encoder_dims"],
                                    decoder_dims=mc["decoder_dims"],
                                    activation=mc["activation"])

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_sampler(self, train_data):
        return None

    def _get_loss_func(self):
        return SoftmaxLoss()

    def _epoch_refresh(self, nepoch: int):
        super()._epoch_refresh(nepoch)
        tc = self.config["train"]
        steps = getattr(self, "_steps_per_epoch", 1)
        anneal = min(float(tc["anneal_max"]),
                     max(nepoch, 0) * steps / float(tc["anneal_total_step"]))
        self.states["anneal"] = jnp.asarray(anneal, jnp.float32)

    def training_step(self, params, batch, rng, states):
        rng_q, rng_s = jax.random.split(rng)
        q_feat = self._get_query_feat(batch)
        query, aux = self.net.apply(
            {"params": params}, q_feat, training=True,
            rngs={"dropout": rng_q}, method=self.net.encode_query,
            mutable=["losses"])
        kl = aux["losses"]["query_encoder"]["kl_loss"][0]
        pos_vec = self._apply(params, "encode_item", self._get_item_feat(batch))
        pos_score = self._apply(params, "score", query, pos_vec)
        pos_score = jnp.where(batch[self.fiid] == 0, -jnp.inf, pos_score)
        item_vec = self._compute_item_vector(params)
        all_score = self._apply(params, "score", query, item_vec)
        loss = self.loss_fn(batch[self.frating], pos_score, all_score)
        return loss + states.get("anneal", 0.0) * kl
