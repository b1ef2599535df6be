"""xDeepFM: compressed interaction network + deep MLP + linear.

Reference: recstudio/model/fm/xdeepfm.py.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import CIN, Embeddings, LinearLayer, make_field_specs


class XDeepFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    cin_layer_size: tuple
    mlp_layer: tuple
    activation: str
    dropout: float
    direct: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        lr_score = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        cin_score = CIN(self.embed_dim, len(self.field_specs),
                        self.cin_layer_size, self.activation, self.direct,
                        name="cin")(emb)
        F = len(self.field_specs)
        mlp_score = MLPModule([F * self.embed_dim, *self.mlp_layer, 1],
                              activation_func=self.activation, dropout=self.dropout,
                              last_activation=False, last_bn=False, name="mlp")(
            emb.reshape(emb.shape[0], -1), training=training).squeeze(-1)
        return lr_score + cin_score + mlp_score


class xDeepFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return XDeepFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                          tuple(mc["cin_layer_size"]), tuple(mc["mlp_layer"]),
                          mc["activation"], mc["dropout"], mc.get("direct", True))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
