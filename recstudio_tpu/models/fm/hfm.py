"""HFM: holographic factorization machine.

Reference: recstudio/model/fm/hfm.py (+ ctr.py:1312) — circular
correlation/convolution pairwise interactions, optional deep head.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (Embeddings, HolographicFMLayer, LinearLayer,
                          make_field_specs)


class HFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    op: str
    deep: bool
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        lr = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        inter = HolographicFMLayer(F, self.op)(emb)            # [B, P, D]
        if self.deep:
            h = MLPModule([inter.shape[1] * inter.shape[2], *self.mlp_layer, 1],
                          activation_func=self.activation, dropout=self.dropout,
                          last_activation=False, last_bn=False, name="mlp")(
                inter.reshape(inter.shape[0], -1), training=training).squeeze(-1)
        else:
            h = nn.Dense(1, use_bias=False, name="proj")(inter.sum(1)).squeeze(-1)
        return lr + h


class HFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return HFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      mc.get("op", "circular_correlation"), mc.get("deep", True),
                      tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
