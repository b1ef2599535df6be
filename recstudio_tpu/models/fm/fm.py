"""FM: factorization machine (first + second order).

Reference: recstudio/model/fm/fm.py.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import Embeddings, FMLayer, LinearLayer, make_field_specs


class FMNet(nn.Module):
    field_specs: tuple
    embed_dim: int

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embeddings")(batch)
        fm_score = FMLayer(reduction="sum")(emb)
        lr_score = LinearLayer(self.field_specs, name="linear")(batch)
        return fm_score + lr_score


class FM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        return FMNet(make_field_specs(self.fields, train_data), self.embed_dim)

    def _get_loss_func(self):
        return BCEWithLogitLoss()
