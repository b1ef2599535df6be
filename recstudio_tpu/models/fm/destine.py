"""DESTINE: disentangled self-attentive network.

Reference: recstudio/model/fm/destine.py (+ ctr.py:601 disentangled
self-attention: unary softmax over fields + whitened pairwise attention).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, LinearLayer, make_field_specs


class DisentangledSelfAttention(nn.Module):
    embed_dim: int
    attention_dim: int
    n_head: int = 1
    dropout: float = 0.0
    residual: bool = True
    scale: bool = True
    relu_before_att: bool = False

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        B, F, _ = inputs.shape
        H = self.n_head
        dph = self.attention_dim // H
        unary = jax.nn.softmax(nn.Dense(H, name="unary")(inputs), axis=1)  # [B, F, H]
        unary = unary.transpose(0, 2, 1).reshape(B * H, F, 1)
        q = nn.Dense(self.attention_dim, name="Wq")(inputs)
        k = nn.Dense(self.attention_dim, name="Wk")(inputs)
        v = nn.Dense(self.attention_dim, name="Wv")(inputs)
        if self.relu_before_att:
            q, k, v = jax.nn.relu(q), jax.nn.relu(k), jax.nn.relu(v)
        def split(x):
            return x.reshape(B, F, H, dph).transpose(0, 2, 1, 3).reshape(B * H, F, dph)
        q, k, v = split(q), split(k), split(v)
        mu_q = q - q.mean(1, keepdims=True)
        mu_k = k - k.mean(1, keepdims=True)
        pair = mu_q @ mu_k.transpose(0, 2, 1)
        if self.scale:
            pair = pair / (dph ** 0.5)
        attn = unary + jax.nn.softmax(pair, axis=2)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out = (attn @ v).reshape(B, H, F, dph).transpose(0, 2, 1, 3).reshape(
            B, F, self.attention_dim)
        if self.residual:
            out = out + nn.Dense(self.attention_dim, name="res")(inputs)
        return out


class DESTINENet(nn.Module):
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
    relu_before_att: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = nn.Dense(self.attention_dim, name="proj")(emb)
        for i in range(self.num_attention_layers):
            x = DisentangledSelfAttention(
                self.attention_dim, self.attention_dim, self.n_head,
                self.dropout, True, True, self.relu_before_att,
                name=f"attn_{i}")(x, training=training)
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


class DESTINE(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DESTINENet(make_field_specs(self.fields, train_data), self.embed_dim,
                          mc["attention_dim"], mc["num_attention_layers"],
                          mc["n_head"], tuple(mc["mlp_layer"]), mc["activation"],
                          mc["dropout"], mc.get("wide", True), mc.get("deep", True),
                          mc.get("relu_before_att", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
