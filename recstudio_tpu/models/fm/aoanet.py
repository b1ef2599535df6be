"""AOANet: architecture & operation adaptive network.

Reference: recstudio/model/fm/aoanet.py (+ ctr.py:1017 generalized interaction
fusion layers).
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class GeneralizedInteractionFusion(nn.Module):
    num_fields: int
    embed_dim: int
    in_subspaces: int
    out_subspaces: int

    @nn.compact
    def __call__(self, b0, bi):
        d = self.embed_dim
        W = self.param("W", lambda k, s: jnp.tile(jnp.eye(d)[None], (self.out_subspaces, 1, 1)),
                       None)
        alpha = self.param("alpha", nn.initializers.ones,
                           (self.num_fields, self.in_subspaces, self.out_subspaces))
        h = self.param("h", nn.initializers.ones, (self.out_subspaces, d, 1))
        outer = jnp.einsum("bfi,bnj->bfnij", b0, bi)
        fusion = jnp.einsum("bfnij,fno->boij", outer, alpha) * W
        return jnp.matmul(fusion, h).squeeze(-1)               # [B, out, D]


class AOANetNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    num_interaction_layers: int
    num_subspaces: int
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        mlp_out = MLPModule([F * self.embed_dim, *self.mlp_layer],
                            activation_func=self.activation, dropout=self.dropout,
                            last_activation=False, last_bn=False, name="mlp")(
            emb.reshape(emb.shape[0], -1), training=training)
        bi = emb
        for i in range(self.num_interaction_layers):
            bi = GeneralizedInteractionFusion(
                F, self.embed_dim,
                F if i == 0 else self.num_subspaces, self.num_subspaces,
                name=f"gin_{i}")(emb, bi)
        gin_out = bi.reshape(bi.shape[0], -1)
        return nn.Dense(1, name="fc")(
            jnp.concatenate([mlp_out, gin_out], -1)).squeeze(-1)


class AOANet(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return AOANetNet(make_field_specs(self.fields, train_data), self.embed_dim,
                         mc["num_interaction_layers"], mc["num_subspaces"],
                         tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
