"""IFM: input-aware factorization machine.

Reference: recstudio/model/fm/ifm.py — a factor-estimating net reweights each
field's embedding and first-order term per instance.
"""
import flax.linen as nn
import jax

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, FMLayer, make_field_specs


class IFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        h = MLPModule([F * self.embed_dim, *self.mlp_layer],
                      activation_func=self.activation, dropout=self.dropout,
                      batch_norm=self.batch_norm, name="fen")(
            emb.reshape(emb.shape[0], -1), training=training)
        weight = jax.nn.softmax(
            nn.Dense(F, use_bias=False, name="fen_out")(h), axis=-1)
        lr_emb = Embeddings(self.field_specs, 1, name="linear_emb")(batch).squeeze(-1)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        lr = (lr_emb * weight).sum(-1) + bias[0]
        fm = FMLayer(reduction="sum")(emb * weight[..., None])
        return lr + fm


class IFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return IFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                      mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
