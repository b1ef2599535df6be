"""LR: logistic regression over all declared features.

Reference: recstudio/model/fm/lr.py.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import LinearLayer, make_field_specs


class LRNet(nn.Module):
    field_specs: tuple

    @nn.compact
    def __call__(self, batch, training: bool = False):
        return LinearLayer(self.field_specs, name="linear")(batch)


class LR(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        return LRNet(make_field_specs(self.fields, train_data))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
