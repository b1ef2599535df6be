"""DeepIM: deep interaction machine (Newton-identity high-order FM).

Reference: recstudio/model/fm/deepim.py (+ ctr.py:1060 InteractionMachine,
orders up to 5 supported here).
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class InteractionMachine(nn.Module):
    embed_dim: int
    order: int = 2

    @nn.compact
    def __call__(self, x):
        assert self.order <= 5, "InteractionMachine supports order <= 5"
        q = x
        p = [q.sum(1)]
        outs = [p[0]]
        for k in range(2, self.order + 1):
            q = q * x
            p.append(q.sum(1))
            p1, *rest = p
            if k == 2:
                outs.append((p[0] ** 2 - p[1]) / 2)
            elif k == 3:
                outs.append((p[0] ** 3 - 3 * p[0] * p[1] + 2 * p[2]) / 6)
            elif k == 4:
                outs.append((p[0] ** 4 - 6 * p[0] ** 2 * p[1] + 3 * p[1] ** 2
                             + 8 * p[0] * p[2] - 6 * p[3]) / 24)
            elif k == 5:
                outs.append((p[0] ** 5 - 10 * p[0] ** 3 * p[1]
                             + 20 * p[0] ** 2 * p[2] - 30 * p[0] * p[3]
                             - 20 * p[1] * p[2] + 15 * p[0] * p[1] ** 2
                             + 24 * p[4]) / 120)
        h = jnp.concatenate(outs, axis=-1)
        return nn.Dense(1, name="fc")(h).squeeze(-1)


class DeepIMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    order: int
    mlp_layer: tuple
    activation: str
    dropout: float
    batch_norm: bool

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        im = InteractionMachine(self.embed_dim, self.order, name="im")(emb)
        mlp = MLPModule([F * self.embed_dim, *self.mlp_layer, 1],
                        activation_func=self.activation, dropout=self.dropout,
                        batch_norm=self.batch_norm, last_activation=False,
                        last_bn=False, name="mlp")(
            emb.reshape(emb.shape[0], -1), training=training).squeeze(-1)
        return im + mlp


class DeepIM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DeepIMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                         mc.get("order", 2), tuple(mc["mlp_layer"]),
                         mc["activation"], mc["dropout"],
                         mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
