"""FiGNN: field interaction graph neural network.

Reference: recstudio/model/fm/fignn.py (+ ctr.py:1435 GraphAggregationLayer,
:1450 FiGNNLayer) — fully-connected field graph with learned edge weights,
GRU state updates, and an attentional readout.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import Embeddings, make_field_specs
from ..module.layers import GRUCell


class FiGNNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        d = self.embed_dim
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        B = emb.shape[0]
        # learned dense field graph (diagonal removed)
        e_i = jnp.repeat(emb, F, axis=1)                        # [B, F*F, D]
        e_j = jnp.tile(emb, (1, F, 1))
        w = nn.Dense(1, use_bias=False, name="edge_w")(
            jnp.concatenate([e_i, e_j], -1)).squeeze(-1)
        w = jax.nn.leaky_relu(w).reshape(B, F, F)
        w = jax.nn.softmax(w, axis=-1)
        w = w * (1.0 - jnp.eye(F))
        h = emb
        gru = GRUCell(d, name="gru")
        for i in range(self.num_layers):
            W_out = self.param(f"W_out_{i}", nn.initializers.normal(0.02), (F, d, d))
            W_in = self.param(f"W_in_{i}", nn.initializers.normal(0.02), (F, d, d))
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (d,))
            h_out = jnp.einsum("fde,bfd->bfe", W_out, h)
            agg = jnp.einsum("bfg,bgd->bfd", w, h_out)
            a = jnp.einsum("fde,bfd->bfe", W_in, agg) + bias
            h_new = gru(h.reshape(B * F, d), a.reshape(B * F, d)).reshape(B, F, d)
            h = h_new + emb
        # attentional readout (FiGNN prediction layer)
        score_w = nn.Dense(1, use_bias=False, name="mlp1")(h).squeeze(-1)   # [B, F]
        gate = nn.Dense(F, use_bias=False, name="mlp2")(h.reshape(B, -1))   # [B, F]
        return (score_w * gate).sum(-1)


class FiGNN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return FiGNNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                        mc["num_layers"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
