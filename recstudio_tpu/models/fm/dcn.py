"""DCN: deep & cross network.

Reference: recstudio/model/fm/dcn.py.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import CrossNetwork, Embeddings, make_field_specs


class DCNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    num_layers: int
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        cross = CrossNetwork(x.shape[-1], self.num_layers, name="cross_net")(x)
        deep = MLPModule([x.shape[-1], *self.mlp_layer],
                         activation_func=self.activation, dropout=self.dropout,
                         batch_norm=self.batch_norm, name="mlp")(x, training=training)
        return nn.Dense(1, name="fc")(jnp.concatenate([deep, cross], -1)).squeeze(-1)


class DCN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DCNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      tuple(mc["mlp_layer"]), mc["num_layers"], mc["activation"],
                      mc["dropout"], mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
