"""ONN: operation-aware neural network (NFFM).

Reference: recstudio/model/fm/onn.py (+ ctr.py:964).
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (Embeddings, LinearLayer, OperationAwareFMLayer,
                          make_field_specs)


class ONNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        lr = LinearLayer(self.field_specs, name="linear")(batch)
        # operation-aware embeddings: one copy of each field per operation
        emb = Embeddings(self.field_specs, self.embed_dim * F,
                         name="embedding")(batch)                 # [B, F, F*D]
        inter = OperationAwareFMLayer(F)(emb)
        h = MLPModule([inter.shape[-1], *self.mlp_layer, 1],
                      activation_func=self.activation, dropout=self.dropout,
                      batch_norm=self.batch_norm, last_activation=False,
                      last_bn=False, name="mlp")(inter, training=training)
        return lr + h.squeeze(-1)


class ONN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return ONNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                      mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
