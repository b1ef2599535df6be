"""PPNet: parameter personalized network (gate-modulated MLPs).

Reference: recstudio/model/fm/ppnet.py (+ ctr.py:1352 GateNN, :1369 PPLayer).
Gate features (e.g. user/item ids) modulate each MLP stage via 2*sigmoid gates.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class PPNetNet(nn.Module):
    field_specs: tuple
    gate_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    gate_hidden_dim: int
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        flat = emb.reshape(emb.shape[0], -1)
        gate_emb = Embeddings(self.gate_specs, self.embed_dim, name="gate_embedding")(batch)
        gate_in = jnp.concatenate(
            [jax.lax.stop_gradient(flat), gate_emb.reshape(gate_emb.shape[0], -1)],
            axis=-1)
        dims = [F * self.embed_dim, *self.mlp_layer]
        h = flat
        for i in range(len(dims) - 1):
            gate = MLPModule([gate_in.shape[-1], self.gate_hidden_dim, dims[i]],
                             activation_func=self.activation,
                             dropout=self.dropout, last_activation=False,
                             name=f"gate_{i}")(gate_in, training=training)
            gate = 2.0 * jax.nn.sigmoid(gate)
            h = MLPModule([dims[i], dims[i + 1]], activation_func=self.activation,
                          dropout=self.dropout, batch_norm=self.batch_norm,
                          name=f"pp_mlp_{i}")(gate * h, training=training)
        return nn.Dense(1, name="fc")(h).squeeze(-1)


class PPNet(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        gate_fields = set(mc.get("gate_fields") or [self.fuid, self.fiid])
        return PPNetNet(make_field_specs(self.fields, train_data),
                        make_field_specs(gate_fields & set(self.fields), train_data),
                        self.embed_dim, tuple(mc["mlp_layer"]),
                        mc.get("gate_hidden_dim", 64), mc["activation"],
                        mc["dropout"], mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
