"""NFM: neural factorization machine.

Reference: recstudio/model/fm/nfm.py (bi-interaction pooling -> batch norm ->
MLP, plus first-order term).
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.layers import SimpleBatchNorm
from ..module.ctr import Embeddings, FMLayer, LinearLayer, make_field_specs


class NFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        lr_score = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        bi = FMLayer()(emb)                                     # [B, D]
        bi = SimpleBatchNorm(name="bn")(bi, training)
        mlp_score = MLPModule([self.embed_dim, *self.mlp_layer, 1],
                              activation_func=self.activation, dropout=self.dropout,
                              batch_norm=self.batch_norm, last_activation=False,
                              last_bn=False, name="mlp")(bi, training=training).squeeze(-1)
        return lr_score + mlp_score


class NFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return NFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                      mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
