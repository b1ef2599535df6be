"""CCPM: convolutional click prediction model.

Reference: recstudio/model/fm/ccpm.py (+ ctr.py:663 ConvLayer) — stacked
field-axis convolutions with tanh and k-max pooling over fields.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, LinearLayer, make_field_specs


class CCPMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    channels: tuple
    heights: tuple
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        lr = LinearLayer(self.field_specs, name="linear")(batch)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb[..., None]                                      # [B, F, D, 1]
        chans = [1] + list(self.channels)
        L = len(self.heights)
        for i, (h, c) in enumerate(zip(self.heights, self.channels)):
            # conv over the field axis, kernel (h, 1), SAME padding
            W = self.param(f"conv_{i}", nn.initializers.xavier_uniform(),
                           (h, 1, chans[i], c))
            x = jax.lax.conv_general_dilated(
                x, W, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.tanh(x)
            if i < L - 1:
                k = max(3, int((1 - (float(i + 1) / L) ** (L - i - 1)) * F))
            else:
                k = 3
            k = min(k, x.shape[1])
            x = jax.lax.top_k(x.transpose(0, 2, 3, 1), k)[0].transpose(0, 3, 1, 2)
        h = x.reshape(x.shape[0], -1)
        out = MLPModule([h.shape[-1], *self.mlp_layer, 1],
                        activation_func=self.activation, dropout=self.dropout,
                        last_activation=False, last_bn=False, name="mlp")(
            h, training=training).squeeze(-1)
        return lr + out


class CCPM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return CCPMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                       tuple(mc["channels"]), tuple(mc["heights"]),
                       tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
