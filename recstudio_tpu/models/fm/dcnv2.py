"""DCNv2: improved deep & cross (full-matrix cross layers, parallel/stacked).

Reference: recstudio/model/fm/dcnv2.py (low_rank mixture-of-experts variant
selected when `low_rank` is set).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule, get_act
from ..module.ctr import CrossNetworkV2, Embeddings, make_field_specs


class CrossNetworkMix(nn.Module):
    """Low-rank mixture-of-experts cross layers (DCN-Mix)."""
    embed_dim: int
    num_layers: int
    low_rank: int
    num_experts: int
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x0):
        act = get_act(self.activation)
        xl = x0
        for i in range(self.num_layers):
            U = self.param(f"U_{i}", nn.initializers.normal(1.0),
                           (self.num_experts, self.embed_dim, self.low_rank))
            V = self.param(f"V_{i}", nn.initializers.normal(1.0),
                           (self.num_experts, self.embed_dim, self.low_rank))
            C = self.param(f"C_{i}", nn.initializers.normal(1.0),
                           (self.num_experts, self.low_rank, self.low_rank))
            bias = self.param(f"bias_{i}", nn.initializers.normal(1.0),
                              (self.embed_dim,))
            gate = nn.Dense(self.num_experts, use_bias=False, name=f"gate_{i}")(xl)
            gate = jax.nn.softmax(gate, axis=-1)
            Vx = act(jnp.einsum("edr,bd->ber", V, xl))
            CVx = act(jnp.einsum("ers,bes->ber", C, Vx))
            UCVx = jnp.einsum("edr,ber->ebd", U, CVx)
            expert_out = x0 * (UCVx + bias)
            xl = jnp.einsum("be,ebd->bd", gate, expert_out) + xl
        return xl


class DCNv2Net(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    num_layers: int
    activation: str
    cross_activation: str
    dropout: float
    batch_norm: bool
    combination: str = "parallel"
    low_rank: int = 0
    num_experts: int = 4

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        if self.low_rank:
            cross = CrossNetworkMix(x.shape[-1], self.num_layers, self.low_rank,
                                    self.num_experts, self.cross_activation,
                                    name="cross_net")(x)
        else:
            cross = CrossNetworkV2(x.shape[-1], self.num_layers, name="cross_net")(x)
        if self.combination == "parallel":
            deep = MLPModule([x.shape[-1], *self.mlp_layer],
                             activation_func=self.activation, dropout=self.dropout,
                             batch_norm=self.batch_norm, name="mlp")(x, training=training)
            out = jnp.concatenate([cross, deep], -1)
        else:  # stacked
            out = MLPModule([x.shape[-1], *self.mlp_layer],
                            activation_func=self.activation, dropout=self.dropout,
                            batch_norm=self.batch_norm, name="mlp")(cross, training=training)
        return nn.Dense(1, name="fc")(out).squeeze(-1)


class DCNv2(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DCNv2Net(make_field_specs(self.fields, train_data), self.embed_dim,
                        tuple(mc["mlp_layer"]), mc["num_layers"], mc["activation"],
                        mc.get("cross_activation", "tanh"), mc["dropout"],
                        mc.get("batch_norm", False), mc.get("combination", "parallel"),
                        mc.get("low_rank") or 0, mc.get("num_experts", 4))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
