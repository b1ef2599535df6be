"""InterHAt: interpretable hierarchical attention.

Reference: recstudio/model/fm/interhat.py (+ ctr.py:1337
AttentionalAggregation).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule, TransformerLayer
from ..module.ctr import Embeddings, make_field_specs


class AttentionalAggregation(nn.Module):
    embed_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, key, value):
        h = jax.nn.relu(nn.Dense(self.hidden_dim, use_bias=False, name="w1")(key))
        w = jax.nn.softmax(nn.Dense(1, use_bias=False, name="w2")(h), axis=1)
        return (w * value).sum(1)


class InterHAtNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    n_head: int
    feedforward_dim: int
    order: int
    aggregation_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x1 = TransformerLayer(self.embed_dim, self.n_head, self.feedforward_dim,
                              self.dropout, "relu", name="trm")(
            emb, training=training)
        xi = x1
        us = []
        for i in range(self.order):
            ui = AttentionalAggregation(self.embed_dim, self.aggregation_dim,
                                        name=f"agg_{i}")(xi, xi)
            us.append(ui)
            xi = ui[:, None, :] * x1 + xi
        U = jnp.stack(us, axis=1)
        uf = AttentionalAggregation(self.embed_dim, self.aggregation_dim,
                                    name="agg_final")(U, U)
        return MLPModule([self.embed_dim, *self.mlp_layer, 1],
                         activation_func=self.activation, dropout=self.dropout,
                         last_activation=False, last_bn=False, name="mlp")(
            uf, training=training).squeeze(-1)


class InterHAt(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return InterHAtNet(make_field_specs(self.fields, train_data),
                           self.embed_dim, mc["n_head"], mc["feedforward_dim"],
                           mc["order"], mc["aggregation_dim"],
                           tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
