"""FiBiNET: SENET reweighting + bilinear feature interactions.

Reference: recstudio/model/fm/fibinet.py.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (BilinearInteraction, Embeddings, LinearLayer,
                          SqueezeExcitation, make_field_specs)


class FiBiNETNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    reduction_ratio: float
    bilinear_type: str
    mlp_layer: tuple
    activation: str
    dropout: float
    excitation_activation: str = "relu"
    shared_bilinear: bool = True

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        lr = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        se_emb = SqueezeExcitation(F, self.reduction_ratio,
                                   self.excitation_activation, name="senet")(emb)
        bilinear = BilinearInteraction(F, self.embed_dim, self.bilinear_type,
                                       name="bilinear")
        p = bilinear(emb)
        q = p if False else (bilinear(se_emb) if self.shared_bilinear else
                             BilinearInteraction(F, self.embed_dim,
                                                 self.bilinear_type,
                                                 name="bilinear_se")(se_emb))
        h = jnp.concatenate([p.reshape(p.shape[0], -1), q.reshape(q.shape[0], -1)],
                            axis=-1)
        mlp = MLPModule([h.shape[-1], *self.mlp_layer, 1],
                        activation_func=self.activation, dropout=self.dropout,
                        last_activation=False, last_bn=False, name="mlp")
        return lr + mlp(h, training=training).squeeze(-1)


class FiBiNET(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return FiBiNETNet(make_field_specs(self.fields, train_data), self.embed_dim,
                          mc["reduction_ratio"], mc["bilinear_type"],
                          tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                          mc.get("excitation_activation", "relu"),
                          mc.get("shared_bilinear", True))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
