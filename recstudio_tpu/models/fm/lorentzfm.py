"""LorentzFM: triangle-pooling interactions in Lorentz space.

Reference: recstudio/model/fm/lorentzfm.py (+ ctr.py:1292 TrianglePoolingLayer).
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import Embeddings, make_field_specs


class LorentzFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        rows, cols = jnp.triu_indices(F, k=1)
        inner = (emb[:, rows, :] * emb[:, cols, :]).sum(-1)      # [B, P]
        zero = jnp.sqrt(1.0 + (emb ** 2).sum(-1))                # [B, F]
        u0, v0 = zero[:, rows], zero[:, cols]
        gamma = 1.0 + (1.0 - inner - u0 - v0) / (u0 * v0)
        return gamma.sum(-1)


class LorentzFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        return LorentzFMNet(make_field_specs(self.fields, train_data),
                            self.embed_dim)

    def _get_loss_func(self):
        return BCEWithLogitLoss()
