"""AutoInt: automatic feature interaction via self-attention.

Reference: recstudio/model/fm/autoint.py.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (Embeddings, LinearLayer,
                          SelfAttentionInteractingLayer, make_field_specs)


class AutoIntNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    attention_dim: int
    num_attention_layers: int
    n_head: int
    mlp_layer: tuple
    activation: str
    dropout: float
    wide: bool = True
    deep: bool = True
    residual: bool = True
    residual_project: bool = True
    layer_norm: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = nn.Dense(self.attention_dim, name="att_proj")(emb)
        for i in range(self.num_attention_layers):
            x = SelfAttentionInteractingLayer(
                self.attention_dim, self.n_head, self.dropout, self.residual,
                self.residual_project, self.layer_norm, name=f"attn_{i}")(
                x, training=training)
        score = nn.Dense(1, name="attn_fc")(x.reshape(x.shape[0], -1)).squeeze(-1)
        if self.wide:
            score = score + LinearLayer(self.field_specs, name="linear")(batch)
        if self.deep:
            F = len(self.field_specs)
            score = score + MLPModule(
                [F * self.embed_dim, *self.mlp_layer, 1],
                activation_func=self.activation, dropout=self.dropout,
                last_activation=False, last_bn=False, name="mlp")(
                emb.reshape(emb.shape[0], -1), training=training).squeeze(-1)
        return score


class AutoInt(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return AutoIntNet(make_field_specs(self.fields, train_data), self.embed_dim,
                          mc["attention_dim"], mc["num_attention_layers"],
                          mc["n_head"], tuple(mc["mlp_layer"]), mc["activation"],
                          mc["dropout"], mc.get("wide", True), mc.get("deep", True),
                          mc.get("residual", True), mc.get("residual_project", True),
                          mc.get("layer_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
