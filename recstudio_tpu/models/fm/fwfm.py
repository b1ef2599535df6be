"""FwFM: field-weighted factorization machine.

Reference: recstudio/model/fm/fwfm.py (linear_type lw / felv / filv).
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import (Embeddings, InnerProductLayer, LinearLayer,
                          make_field_specs)


class FwFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    linear_type: str = "lw"

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        prods = InnerProductLayer(F)(emb)                       # [B, P]
        fwfm = nn.Dense(1, name="field_weight")(prods).squeeze(-1)
        lt = self.linear_type.lower()
        if lt == "lw":
            lr = LinearLayer(self.field_specs, name="linear")(batch)
        elif lt == "felv":
            lr_emb = Embeddings(self.field_specs, self.embed_dim,
                                name="linear_embedding")(batch)
            lr = (lr_emb * emb).sum(axis=(1, 2))
        elif lt == "filv":
            lr = nn.Dense(1, use_bias=False, name="linear")(
                emb.reshape(emb.shape[0], -1)).squeeze(-1)
        else:
            raise ValueError("linear_type must be lw|felv|filv")
        return lr + fwfm


class FwFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        return FwFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                       self.config["model"].get("linear_type", "lw"))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
