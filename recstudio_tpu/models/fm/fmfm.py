"""FmFM: field-matrixed factorization machine (FM^2).

Reference: recstudio/model/fm/fmfm.py.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import Embeddings, FMFMLayer, LinearLayer, make_field_specs


class FmFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int

    @nn.compact
    def __call__(self, batch, training: bool = False):
        lr = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        return lr + FMFMLayer(len(self.field_specs), self.embed_dim,
                              name="fmfm")(emb)


class FmFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        return FmFMNet(make_field_specs(self.fields, train_data), self.embed_dim)

    def _get_loss_func(self):
        return BCEWithLogitLoss()
