"""DLRM: deep learning recommendation model.

Reference: recstudio/model/fm/dlrm.py — sparse feature embeddings + a bottom
MLP over the dense features, pairwise-dot (or cat/sum) interaction, top MLP.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, InnerProductLayer, make_field_specs


class DLRMNet(nn.Module):
    sparse_specs: tuple
    dense_fields: tuple
    embed_dim: int
    bottom_mlp_layer: tuple
    top_mlp_layer: tuple
    bottom_activation: str
    top_activation: str
    bottom_dropout: float
    top_dropout: float
    op: str = "dot"

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.sparse_specs, self.embed_dim, name="embedding")(batch)
        has_dense = len(self.dense_fields) > 0
        dense_emb = None
        if has_dense:
            dense = jnp.stack([batch[f].astype(jnp.float32)
                               for f in self.dense_fields], axis=-1)
            dense_emb = MLPModule(
                [len(self.dense_fields), *self.bottom_mlp_layer, self.embed_dim],
                activation_func=self.bottom_activation, dropout=self.bottom_dropout,
                last_activation=False, last_bn=False, name="bottom_mlp")(
                dense, training=training)
            emb = jnp.concatenate([emb, dense_emb[:, None, :]], axis=1)
        F = emb.shape[1]
        if self.op == "dot":
            inter = InnerProductLayer(F)(emb)
            if has_dense:
                inter = jnp.concatenate([inter, dense_emb], axis=-1)
        elif self.op == "cat":
            inter = emb.reshape(emb.shape[0], -1)
        elif self.op == "sum":
            inter = emb.sum(1)
        else:
            raise ValueError("op must be dot|cat|sum")
        return MLPModule([inter.shape[-1], *self.top_mlp_layer, 1],
                         activation_func=self.top_activation,
                         dropout=self.top_dropout, last_activation=False,
                         last_bn=False, name="top_mlp")(
            inter, training=training).squeeze(-1)


class DLRM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        ratings = self.frating if isinstance(self.frating, list) else [self.frating]
        sparse = {f for f in self.fields
                  if train_data.field2type.get(f, "").startswith("token")}
        dense = tuple(sorted(f for f in self.fields
                             if train_data.field2type.get(f) == "float"
                             and f not in ratings))
        return DLRMNet(make_field_specs(sparse, train_data), dense,
                       self.embed_dim, tuple(mc["bottom_mlp_layer"]),
                       tuple(mc["top_mlp_layer"]), mc["bottom_activation"],
                       mc["top_activation"], mc["bottom_dropout"],
                       mc["top_dropout"], mc.get("op", "dot"))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
