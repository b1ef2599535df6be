"""DeepFM: FM + deep MLP over shared embeddings.

Reference: recstudio/model/fm/deepfm.py:7-30.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, FMLayer, LinearLayer, make_field_specs


class DeepFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        lr_score = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        fm_score = FMLayer(reduction="sum")(emb)
        F = len(self.field_specs)
        mlp = MLPModule([F * self.embed_dim, *self.mlp_layer, 1],
                        activation_func=self.activation, dropout=self.dropout,
                        last_activation=False, last_bn=False, name="mlp")
        mlp_score = mlp(emb.reshape(emb.shape[0], -1), training=training).squeeze(-1)
        return lr_score + fm_score + mlp_score


class DeepFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DeepFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                         tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
