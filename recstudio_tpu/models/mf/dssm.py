"""DSSM: two-tower deep structured semantic model over side features.

Reference: recstudio/model/mf/dssm.py — user-side and item-side feature
embeddings, each flattened through an MLP tower; inner-product scoring with
BinaryCrossEntropy loss and uniform negatives.
"""
from __future__ import annotations

import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BinaryCrossEntropyLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs
from ..scorer import InnerProductScorer


class FeatureTower(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, feat, training: bool = False):
        if not isinstance(feat, dict):  # single id field
            feat = {self.field_specs[0][0]: feat}
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(feat)
        flat = emb.reshape(*emb.shape[:-2], -1)
        return MLPModule([len(self.field_specs) * self.embed_dim, *self.mlp_layer],
                         activation_func=self.activation, dropout=self.dropout,
                         batch_norm=self.batch_norm, name="mlp")(
            flat, training=training)


class DSSM(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _set_data_field(self, data):
        data.use_field = set(data.field2type.keys())

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        fields = set(train_data.user_feat.fields) & set(train_data.use_field) \
            if train_data.user_feat is not None else {self.fuid}
        return FeatureTower(make_field_specs(fields, train_data), self.embed_dim,
                            tuple(mc["mlp_layer"]), mc["activation"],
                            mc["dropout"], mc.get("batch_norm", False))

    def _get_item_encoder(self, train_data):
        mc = self.config["model"]
        # note: item_fields not yet set when this is called; derive directly
        fields = set(train_data.item_feat.fields) & set(train_data.use_field) \
            if train_data.item_feat is not None else {self.fiid}
        return FeatureTower(make_field_specs(fields, train_data), self.embed_dim,
                            tuple(mc["mlp_layer"]), mc["activation"],
                            mc["dropout"], mc.get("batch_norm", False))

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()

