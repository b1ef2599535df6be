"""AFN: adaptive factorization network (logarithmic transform).

Reference: recstudio/model/fm/afn.py (+ ctr.py:540) — log-transform layer over
separate embeddings + MLP, optionally ensembled with a DNN branch.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, LogTransformLayer, make_field_specs


class AFNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    log_hidden_size: int
    mlp_layer: tuple
    activation: str
    dropout: float
    ensemble: bool
    ensemble_mlp_layer: tuple
    ensemble_activation: str
    ensemble_dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        log_out = LogTransformLayer(F, self.log_hidden_size, name="ltl")(
            emb, training)
        afn = MLPModule([log_out.shape[-1], *self.mlp_layer, 1],
                        activation_func=self.activation, dropout=self.dropout,
                        last_activation=False, last_bn=False, name="afn_mlp")(
            log_out, training=training).squeeze(-1)
        if not self.ensemble:
            return afn
        emb2 = Embeddings(self.field_specs, self.embed_dim,
                          name="embedding_dnn")(batch)
        dnn = MLPModule([F * self.embed_dim, *self.ensemble_mlp_layer, 1],
                        activation_func=self.ensemble_activation,
                        dropout=self.ensemble_dropout, last_activation=False,
                        last_bn=False, name="dnn_mlp")(
            emb2.reshape(emb2.shape[0], -1), training=training).squeeze(-1)
        w = self.param("ensemble_weight", nn.initializers.zeros, (2,))
        return afn * (0.5 + w[0]) + dnn * (0.5 + w[1])


class AFN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return AFNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      mc["log_hidden_size"], tuple(mc["mlp_layer"]),
                      mc["activation"], mc["dropout"], mc.get("ensemble", True),
                      tuple(mc.get("ensemble_mlp_layer", [64])),
                      mc.get("ensemble_activation", "relu"),
                      mc.get("ensemble_dropout", 0.0))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
