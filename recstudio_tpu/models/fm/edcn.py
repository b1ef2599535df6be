"""EDCN: enhanced deep & cross with bridge/regulation information sharing.

Reference: recstudio/model/fm/edcn.py (+ ctr.py:1133 BridgeLayer, :1177
RegulationLayer).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class BridgeLayer(nn.Module):
    embed_dim: int
    bridge_type: str = "hadamard_product"

    @nn.compact
    def __call__(self, x0, x1):
        bt = self.bridge_type.lower()
        if bt == "pointwise_addition":
            return x0 + x1
        if bt == "hadamard_product":
            return x0 * x1
        if bt == "concatenation":
            return jax.nn.relu(nn.Dense(self.embed_dim, name="proj")(
                jnp.concatenate([x0, x1], -1)))
        # attention_pooling
        def att(name, x):
            h = jax.nn.relu(nn.Dense(self.embed_dim, name=f"{name}_1")(x))
            return jax.nn.softmax(nn.Dense(self.embed_dim, use_bias=False,
                                           name=f"{name}_2")(h), axis=-1)
        return att("a0", x0) * x0 + att("a1", x1) * x1


class RegulationLayer(nn.Module):
    num_fields: int
    embed_dim: int
    temperature: float = 1.0

    @nn.compact
    def __call__(self, x):
        cg = self.param("cross_gate", nn.initializers.ones, (self.num_fields,))
        dg = self.param("deep_gate", nn.initializers.ones, (self.num_fields,))
        cgs = jnp.repeat(jax.nn.softmax(cg / self.temperature), self.embed_dim)
        dgs = jnp.repeat(jax.nn.softmax(dg / self.temperature), self.embed_dim)
        return cgs * x, dgs * x


class EDCNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    num_layers: int
    bridge_type: str
    temperature: float
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        width = F * self.embed_dim
        ci, di = RegulationLayer(F, self.embed_dim, self.temperature,
                                 name="regulation_0")(x)
        c0 = ci
        bi = ci
        for i in range(self.num_layers):
            w = self.param(f"cross_w_{i}", nn.initializers.normal(1.0), (width,))
            b = self.param(f"cross_b_{i}", nn.initializers.zeros, (width,))
            ci = ci + c0 * (ci @ w)[:, None] + b
            di = MLPModule([width, width], activation_func=self.activation,
                           dropout=self.dropout, batch_norm=self.batch_norm,
                           name=f"deep_{i}")(di, training=training)
            bi = BridgeLayer(width, self.bridge_type, name=f"bridge_{i}")(ci, di)
            if i + 1 < self.num_layers:
                ci, di = RegulationLayer(F, self.embed_dim, self.temperature,
                                         name=f"regulation_{i+1}")(bi)
        return nn.Dense(1, name="fc")(jnp.concatenate([ci, di, bi], -1)).squeeze(-1)


class EDCN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return EDCNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                       mc["num_layers"], mc.get("bridge_type", "hadamard_product"),
                       mc.get("temperature", 1.0), mc["activation"],
                       mc["dropout"], mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
