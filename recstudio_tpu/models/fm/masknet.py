"""MaskNet: instance-guided mask blocks (serial or parallel).

Reference: recstudio/model/fm/masknet.py (+ ctr.py:828-924).
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, MaskBlock, make_field_specs


class MaskNetNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    parallel: bool
    num_blocks: int
    block_dim: int
    reduction_ratio: float
    mlp_layer: tuple
    activation: str
    dropout: float
    hidden_layer_norm: bool = True

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        ln_emb = nn.LayerNorm(name="emb_ln")(emb)
        flat = emb.reshape(emb.shape[0], -1)
        ln_flat = ln_emb.reshape(emb.shape[0], -1)
        width = F * self.embed_dim
        if self.parallel:
            outs = [MaskBlock(width, width, self.block_dim, self.reduction_ratio,
                              self.activation, self.dropout, self.hidden_layer_norm,
                              name=f"block_{i}")(flat, ln_flat, training=training)
                    for i in range(self.num_blocks)]
            h = jnp.concatenate(outs, axis=-1)
            return MLPModule([h.shape[-1], *self.mlp_layer, 1],
                             activation_func=self.activation, dropout=self.dropout,
                             last_activation=False, last_bn=False, name="mlp")(
                h, training=training).squeeze(-1)
        # serial
        h = ln_flat
        dims = [width] + [self.block_dim] * self.num_blocks
        for i in range(self.num_blocks):
            h = MaskBlock(width, dims[i], dims[i + 1], self.reduction_ratio,
                          self.activation, self.dropout, self.hidden_layer_norm,
                          name=f"block_{i}")(flat, h, training=training)
        return nn.Dense(1, name="fc")(h).squeeze(-1)


class MaskNet(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return MaskNetNet(make_field_specs(self.fields, train_data), self.embed_dim,
                          mc.get("parallel", False), mc["num_blocks"],
                          mc["block_dim"], mc.get("reduction_ratio", 1),
                          tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                          mc.get("hidden_layer_norm", True))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
