"""PLE: progressive layered extraction.

Reference: recstudio/model/multitask/ple.py (+ ctr.py:1481 ExtractionLayer) —
per-task specific experts + shared experts with per-task gates, stacked
extraction levels, per-task towers.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class ExtractionLayer(nn.Module):
    in_dim: int
    specific_per_task: int
    num_task: int
    num_shared: int
    share_gate: bool
    expert_mlp_layer: tuple
    expert_activation: str
    expert_dropout: float
    gate_mlp_layer: tuple
    gate_activation: str
    gate_dropout: float

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        # inputs: list of num_task + 1 tensors (task inputs + shared input)
        def expert(name):
            return MLPModule([self.in_dim, *self.expert_mlp_layer],
                             activation_func=self.expert_activation,
                             dropout=self.expert_dropout, name=name)

        def gate(name, n_out):
            return MLPModule([self.in_dim, *self.gate_mlp_layer, n_out],
                             activation_func=self.gate_activation,
                             dropout=self.gate_dropout, last_activation=False,
                             name=name)

        shared_out = jnp.stack([expert(f"shared_{s}")(inputs[-1], training=training)
                                for s in range(self.num_shared)], axis=1)
        spec_outs = [jnp.stack([expert(f"task{t}_{e}")(inputs[t], training=training)
                                for e in range(self.specific_per_task)], axis=1)
                     for t in range(self.num_task)]
        outs = []
        for t in range(self.num_task):
            experts = jnp.concatenate([spec_outs[t], shared_out], axis=1)
            g = jax.nn.softmax(gate(f"gate_{t}",
                                    self.specific_per_task + self.num_shared)(
                inputs[t], training=training), axis=-1)
            outs.append((g[..., None] * experts).sum(1))
        if self.share_gate:
            # shared path: gate over ALL experts (task-specific + shared)
            all_exp = jnp.concatenate(spec_outs + [shared_out], axis=1)
            n_all = self.num_task * self.specific_per_task + self.num_shared
            g = jax.nn.softmax(gate("gate_shared", n_all)(
                inputs[-1], training=training), axis=-1)
            outs.append((g[..., None] * all_exp).sum(1))
        return outs


class PLENet(nn.Module):
    field_specs: tuple
    embed_dim: int
    ratings: tuple
    num_levels: int
    specific_per_task: int
    num_shared: int
    expert_mlp_layer: tuple
    gate_mlp_layer: tuple
    tower_mlp_layer: tuple
    expert_activation: str
    gate_activation: str
    tower_activation: str
    expert_dropout: float
    gate_dropout: float
    tower_dropout: float
    tower_batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        T = len(self.ratings)
        inputs = [x] * (T + 1)
        in_dim = x.shape[-1]
        for lvl in range(self.num_levels):
            last = lvl == self.num_levels - 1
            outs = ExtractionLayer(
                in_dim, self.specific_per_task, T, self.num_shared,
                not last, self.expert_mlp_layer, self.expert_activation,
                self.expert_dropout, self.gate_mlp_layer, self.gate_activation,
                self.gate_dropout, name=f"extraction_{lvl}")(inputs, training=training)
            inputs = outs if not last else outs + [outs[-1]]
            in_dim = self.expert_mlp_layer[-1]
        out = {}
        for t, r in enumerate(self.ratings):
            out[r] = MLPModule([self.expert_mlp_layer[-1], *self.tower_mlp_layer, 1],
                               activation_func=self.tower_activation,
                               dropout=self.tower_dropout,
                               batch_norm=self.tower_batch_norm,
                               last_activation=False, last_bn=False,
                               name=f"tower_{r}")(inputs[t],
                                                  training=training).squeeze(-1)
        return out


class PLE(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        assert isinstance(self.frating, list)
        return PLENet(make_field_specs(self.fields, train_data), self.embed_dim,
                      tuple(self.frating), mc["num_levels"],
                      mc["specific_experts_per_task"], mc["num_shared_experts"],
                      tuple(mc["expert_mlp_layer"]), tuple(mc["gate_mlp_layer"]),
                      tuple(mc["tower_mlp_layer"]), mc["expert_activation"],
                      mc["gate_activation"], mc["tower_activation"],
                      mc["expert_dropout"], mc["gate_dropout"],
                      mc["tower_dropout"], mc.get("tower_batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
