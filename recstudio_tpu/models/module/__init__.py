from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .gru import AGRU, AIGRU, AUGRU
from .layers import (AttentionLayer, CrossCompressUnit, Dice, FeatInterLayers,
                     GRULayer, HStackLayer, KMaxPoolingLayer, LambdaLayer,
                     MLPModule, MultiHeadAttention, ResidualLayer,
                     SeqPoolingLayer, TransformerEncoder, TransformerLayer,
                     VStackLayer, get_act)


class Embedding(nn.Module):
    """Embedding table with [PAD]=0 row semantics (zeroed at init, gradient
    masked by the engine — torch padding_idx contract)."""
    num_embeddings: int
    features: int
    padding_idx: Optional[int] = 0

    @nn.compact
    def __call__(self, ids, training: bool = False):
        table = self.param("embedding", nn.initializers.normal(0.02),
                           (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0)


__all__ = [
    "Embedding", "MLPModule", "get_act", "Dice", "GRULayer", "SeqPoolingLayer",
    "AGRU", "AUGRU", "AIGRU",
    "AttentionLayer", "TransformerLayer", "TransformerEncoder", "LambdaLayer",
    "HStackLayer", "VStackLayer", "KMaxPoolingLayer", "ResidualLayer",
    "CrossCompressUnit", "FeatInterLayers",
]
