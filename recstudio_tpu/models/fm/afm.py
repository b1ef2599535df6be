"""AFM: attentional factorization machine.

Reference: recstudio/model/fm/afm.py.
"""
import flax.linen as nn

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import AFMLayer, Embeddings, LinearLayer, make_field_specs


class AFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    attention_dim: int
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        lr_score = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        afm_score = AFMLayer(self.embed_dim, self.attention_dim,
                             len(self.field_specs), self.dropout,
                             name="afm")(emb, training=training)
        return lr_score + afm_score


class AFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return AFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      mc["attention_dim"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
