"""MMoE: multi-gate mixture-of-experts multi-task ranker.

Reference: recstudio/model/multitask/mmoe.py:18.

TPU design: the expert bank is ONE vmapped MLP whose parameters carry a
leading expert axis ([E, in, out] kernels) instead of E separate modules.
Besides executing as batched matmuls on the MXU (one [B, E*De]-shaped
einsum rather than E thin ones), this makes the experts shardable: under a
``train.mesh`` the engine row-shards any ``experts`` parameter bank over
the model axis (parallel/mesh.py) — expert parallelism, with GSPMD turning
the mixture-sum over experts into a psum across shards.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class MMoENet(nn.Module):
    field_specs: tuple
    embed_dim: int
    ratings: tuple
    num_experts: int
    expert_mlp_layer: tuple
    gate_mlp_layer: tuple
    tower_mlp_layer: tuple
    expert_activation: str = "relu"
    gate_activation: str = "relu"
    tower_activation: str = "relu"
    expert_dropout: float = 0.0
    gate_dropout: float = 0.0
    tower_dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        bank = nn.vmap(
            MLPModule,
            in_axes=(None, None), out_axes=1,    # x, training broadcast; [B, E, De] out
            variable_axes={"params": 0},         # leading expert axis
            split_rngs={"params": True, "dropout": True},
            axis_size=self.num_experts,
        )([x.shape[-1], *self.expert_mlp_layer],
          activation_func=self.expert_activation,
          dropout=self.expert_dropout, name="experts")
        # `training` MUST be positional: flax's lifted vmap silently drops
        # kwargs (RuntimeWarning), which disabled expert dropout entirely.
        experts = bank(x, training)                            # [B, E, De]
        out = {}
        for r in self.ratings:
            gate = MLPModule([x.shape[-1], *self.gate_mlp_layer, self.num_experts],
                             activation_func=self.gate_activation,
                             dropout=self.gate_dropout, name=f"gate_{r}")(
                x, training=training)
            gate = jax.nn.softmax(gate, axis=-1)
            mixed = (gate[..., None] * experts).sum(1)
            out[r] = MLPModule([self.expert_mlp_layer[-1], *self.tower_mlp_layer, 1],
                               activation_func=self.tower_activation,
                               dropout=self.tower_dropout, last_activation=False,
                               last_bn=False, name=f"tower_{r}")(
                mixed, training=training).squeeze(-1)
        return out


class MMoE(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        assert isinstance(self.frating, list), "MMoE expects a list rating_field"
        return MMoENet(
            make_field_specs(self.fields, train_data), self.embed_dim,
            tuple(self.frating), mc["num_experts"], tuple(mc["expert_mlp_layer"]),
            tuple(mc["gate_mlp_layer"]), tuple(mc["tower_mlp_layer"]),
            mc["expert_activation"], mc["gate_activation"], mc["tower_activation"],
            mc["expert_dropout"], mc["gate_dropout"], mc["tower_dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
