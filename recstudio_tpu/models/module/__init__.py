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
        # ids are factorized by the data layer / drawn modulo the catalog by
        # the samplers, so they are in [0, N) by construction. The default
        # take() wraps negatives with a per-element select that XLA runs
        # serialized in scalar memory (gather indices live in SMEM) — at
        # DeepFM shapes those index fixups were ~20% of the train step.
        return table.at[ids].get(mode="promise_in_bounds")


__all__ = [
    "Embedding", "MLPModule", "get_act", "Dice", "GRULayer", "SeqPoolingLayer",
    "AGRU", "AUGRU", "AIGRU",
    "AttentionLayer", "TransformerLayer", "TransformerEncoder", "LambdaLayer",
    "HStackLayer", "VStackLayer", "KMaxPoolingLayer", "ResidualLayer",
    "CrossCompressUnit", "FeatInterLayers",
]
