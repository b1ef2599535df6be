"""HardShare: shared-bottom multi-task ranker.

Reference: recstudio/model/multitask/hardshare.py — shared bottom MLP over the
feature embeddings, one top MLP head per rating field, softmax-weighted sum of
per-task BCE losses.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class HardShareNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    ratings: tuple
    bottom_mlp_layer: tuple
    top_mlp_layer: tuple
    bottom_activation: str = "relu"
    top_activation: str = "relu"
    bottom_dropout: float = 0.0
    top_dropout: float = 0.0
    bottom_batch_norm: bool = False
    top_batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        F = len(self.field_specs)
        shared = MLPModule([F * self.embed_dim, *self.bottom_mlp_layer],
                           activation_func=self.bottom_activation,
                           dropout=self.bottom_dropout,
                           batch_norm=self.bottom_batch_norm, name="bottom")(
            emb.reshape(emb.shape[0], -1), training=training)
        out = {}
        for r in self.ratings:
            out[r] = MLPModule([self.bottom_mlp_layer[-1], *self.top_mlp_layer, 1],
                               activation_func=self.top_activation,
                               dropout=self.top_dropout,
                               batch_norm=self.top_batch_norm,
                               last_activation=False, name=f"top_{r}")(
                shared, training=training).squeeze(-1)
        return out


class HardShare(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        assert isinstance(self.frating, list), "HardShare expects a list rating_field"
        return HardShareNet(
            make_field_specs(self.fields, train_data), self.embed_dim,
            tuple(self.frating), tuple(mc["bottom_mlp_layer"]),
            tuple(mc["top_mlp_layer"]), mc["bottom_activation"],
            mc["top_activation"], mc["bottom_dropout"], mc["top_dropout"],
            mc.get("bottom_batch_norm", False), mc.get("top_batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
