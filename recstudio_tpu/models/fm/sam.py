"""SAM: shallow attentive interaction model.

Reference: recstudio/model/fm/sam.py (+ ctr.py:1392 SAMFeatureInteraction:
variants sam1 / sam2a / sam2e / sam3a / sam3e).
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module.ctr import Embeddings, make_field_specs


class SAMInteraction(nn.Module):
    interaction_type: str
    embed_dim: int
    num_fields: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        it = self.interaction_type
        if it == "sam1":
            out = inputs
        elif it == "sam2a":
            W = self.param("W", nn.initializers.ones,
                           (self.num_fields, self.num_fields, self.embed_dim))
            inner = inputs @ inputs.transpose(0, 2, 1)
            out = inner[..., None] * W
        elif it == "sam2e":
            inner = jnp.einsum("bFd,bfd->bFfd", inputs, inputs)
            out = inner.sum(-1, keepdims=True) * inner
        else:  # sam3a / sam3e
            K = nn.Dense(self.embed_dim, use_bias=False, name="K")
            res = nn.Dense(self.embed_dim, use_bias=False, name="res")
            inner = inputs @ K(inputs).transpose(0, 2, 1)
            if it == "sam3a":
                W = self.param("W", nn.initializers.ones,
                               (self.num_fields, self.num_fields, self.embed_dim))
                out = (inner[..., None] * W).sum(2)
            else:
                out = (inner[..., None]
                       * jnp.einsum("bFd,bfd->bFfd", inputs, inputs)).sum(2)
            out = out + res(inputs)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return out


class SAMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    interaction_type: str
    aggregation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        out = SAMInteraction(self.interaction_type, self.embed_dim, F,
                             self.dropout, name="interaction")(emb, training=training)
        if self.aggregation == "concat":
            h = out.reshape(out.shape[0], -1)
        else:  # weighted_pooling
            h = out.reshape(out.shape[0], -1)
        return nn.Dense(1, name="fc")(h).squeeze(-1)


class SAM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return SAMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                      mc.get("interaction_type", "sam2e"),
                      mc.get("aggregation", "concat"), mc.get("dropout", 0.0))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
