from typing import Optional

import flax.linen as nn
import jax
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
        # train.embedding_lookup: a2a — route the read through the
        # all-to-all dedup exchange (comm ~ unique ids instead of mp*B*D)
        # when the engine activated it and this table actually row-shards
        # (same divisibility rule as parallel/mesh.py param_shardings)
        from ...parallel.embedding import a2a_lookup_mesh, mp_table_lookup
        mesh = a2a_lookup_mesh()
        if (mesh is not None and mesh.shape.get("mp", 1) > 1
                and self.num_embeddings % mesh.shape["mp"] == 0
                # a2a needs a jit context (manual mp axes); eager applies —
                # flax init, ad-hoc net.apply — keep the dense read
                and isinstance(jnp.asarray(table), jax.core.Tracer)):
            return mp_table_lookup(mesh, table, ids)
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
