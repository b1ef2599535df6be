"""AITM: adaptive information transfer multi-task model.

Reference: recstudio/model/multitask/aitm.py — sequential task towers with an
attention-based transfer from the previous task plus a calibrator loss that
enforces score monotonicity across the task chain.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule, MultiHeadAttention
from ..module.ctr import Embeddings, make_field_specs


class AITMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    ratings: tuple
    tower_mlp_layer: tuple
    tower_activation: str
    tower_dropout: float
    tower_batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        T = self.tower_mlp_layer[-1]
        out = {}
        info_out = None
        for i, r in enumerate(self.ratings):
            tower_out = MLPModule([x.shape[-1], *self.tower_mlp_layer],
                                  activation_func=self.tower_activation,
                                  dropout=self.tower_dropout,
                                  batch_norm=self.tower_batch_norm,
                                  name=f"tower_{r}")(x, training=training)
            if i == 0:
                ait_out = tower_out
            else:
                u = jnp.stack([info_out, tower_out], axis=1)     # [B, 2, T]
                ait_out = MultiHeadAttention(T, n_head=1, name=f"att_{r}")(
                    u, u, u, training=training).sum(1)
            out[r] = nn.Dense(1, name=f"fc_{r}")(ait_out).squeeze(-1)
            if i < len(self.ratings) - 1:
                info_out = jax.nn.relu(nn.Dense(T, name=f"info_{r}")(ait_out))
        return out


class AITM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        assert isinstance(self.frating, list)
        return AITMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                       tuple(self.frating), tuple(mc["tower_mlp_layer"]),
                       mc["tower_activation"], mc["tower_dropout"],
                       mc.get("tower_batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()

    def training_step(self, params, batch, rng, states):
        base = super().training_step(params, batch, rng, states)
        scores = self.score(params, batch, training=True, rng=rng)
        # calibrator: later tasks in the chain must not out-score earlier ones
        calib = sum(jnp.mean(jnp.maximum(scores[r_next] - scores[r_prev], 0.0))
                    for r_prev, r_next in zip(self.frating[:-1], self.frating[1:]))
        return base + calib