"""FFM: field-aware factorization machine.

Reference: recstudio/model/fm/ffm.py.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import (Embeddings, FieldAwareFMLayer, LinearLayer,
                          make_field_specs)


class FFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        lr = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim * (F - 1),
                         name="embedding")(batch)
        return lr + FieldAwareFMLayer(F)(emb)


class FFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        return FFMNet(make_field_specs(self.fields, train_data), self.embed_dim)

    def _get_loss_func(self):
        return BCEWithLogitLoss()
