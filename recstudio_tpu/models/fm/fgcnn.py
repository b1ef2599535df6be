"""FGCNN: feature generation by CNN + IPNN over raw+generated features.

Reference: recstudio/model/fm/fgcnn.py (+ ctr.py:696 FGCNNLayer) — field-axis
convolutions with max-pooling generate new feature maps which are recombined
into extra embeddings; an inner-product layer + MLP scores the union.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, InnerProductLayer, make_field_specs


class FGCNNLayer(nn.Module):
    num_raw_fields: int
    embed_dim: int
    channels: tuple
    heights: tuple
    pooling_sizes: tuple
    recombine_channels: tuple

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        # inputs: [B, F, D]
        B, F, D = inputs.shape
        x = inputs[..., None]                                   # NHWC: [B, F, D, 1]
        chans = [1] + list(self.channels)
        new_embs = []
        height = F
        for i, (c, h, p, rc) in enumerate(zip(self.channels, self.heights,
                                              self.pooling_sizes,
                                              self.recombine_channels)):
            W = self.param(f"conv_{i}", nn.initializers.xavier_uniform(),
                           (h, 1, chans[i], c))
            x = jax.lax.conv_general_dilated(
                x, W, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.tanh(x)
            # max pool over the field axis
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, p, 1, 1), (1, p, 1, 1), "VALID")
            height = height // p
            rec = nn.Dense(rc * height * D, name=f"recomb_{i}")(
                x.reshape(B, -1))
            new_embs.append(jnp.tanh(rec).reshape(B, -1, D))
        return jnp.concatenate(new_embs, axis=1)


class FGCNNNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    channels: tuple
    heights: tuple
    pooling_sizes: tuple
    recombine_channels: tuple
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        emb_for_gen = Embeddings(self.field_specs, self.embed_dim,
                                 name="gen_embedding")(batch)
        new_emb = FGCNNLayer(F, self.embed_dim, self.channels, self.heights,
                             self.pooling_sizes, self.recombine_channels,
                             name="fgcnn")(emb_for_gen, training=training)
        all_emb = jnp.concatenate([emb, new_emb], axis=1)
        Ftot = all_emb.shape[1]
        prods = InnerProductLayer(Ftot)(all_emb)
        h = jnp.concatenate([all_emb.reshape(all_emb.shape[0], -1), prods], -1)
        return MLPModule([h.shape[-1], *self.mlp_layer, 1],
                         activation_func=self.activation, dropout=self.dropout,
                         last_activation=False, last_bn=False, name="mlp")(
            h, training=training).squeeze(-1)


class FGCNN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return FGCNNNet(make_field_specs(self.fields, train_data), self.embed_dim,
                        tuple(mc["channels"]), tuple(mc["heights"]),
                        tuple(mc["pooling_sizes"]), tuple(mc["recombine_channels"]),
                        tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
