"""PNN: product-based neural network (inner / outer products).

Reference: recstudio/model/fm/pnn.py.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (Embeddings, InnerProductLayer, OuterProductLayer,
                          make_field_specs)


class PNNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float
    batch_norm: bool
    product_type: str = "inner"

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        F = len(self.field_specs)
        flat = emb.reshape(emb.shape[0], -1)
        if self.product_type == "inner":
            prod = InnerProductLayer(F)(emb)
        elif self.product_type == "outer":
            prod = OuterProductLayer(F, self.embed_dim, name="outer")(emb)
        else:
            raise ValueError("product_type must be inner or outer")
        x = jnp.concatenate([flat, prod], axis=-1)
        out = MLPModule([x.shape[-1], *self.mlp_layer, 1],
                        activation_func=self.activation, dropout=self.dropout,
                        batch_norm=self.batch_norm, last_activation=False,
                        last_bn=False, name="mlp")(x, training=training)
        return out.squeeze(-1)


class PNN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return PNNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                      mc.get("batch_norm", False), mc.get("product_type", "inner"))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
