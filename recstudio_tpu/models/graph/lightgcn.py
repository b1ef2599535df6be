"""LightGCN: linear whole-graph propagation CF.

Reference: recstudio/model/graph/lightgcn.py:14-85 — n-layer normalized
propagation, layer-mean readout, BPR loss + L2 regularization on the raw
(layer-0) embeddings of the batch's users/items/negatives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..loss_func import l2_reg_loss_fn
from .base import BaseGraphRetriever


def _mean_walk_operator(adj: jax.Array, n_layers: int, out_dtype) -> jax.Array:
    """M = (I + A + ... + A^L) / (L+1), computed on device under jit so the
    power/accumulator temporaries are XLA-managed (buffer reuse keeps the
    transient footprint ~2 extra [N,N] matrices, not 4)."""
    power = acc = jnp.eye(adj.shape[0], dtype=adj.dtype)
    for _ in range(n_layers):
        power = adj @ power
        acc = acc + power
    return (acc / (n_layers + 1)).astype(out_dtype)


class LightGCN(BaseGraphRetriever):

    # Subclasses whose OTHER paths (beyond ``propagate``) read the dense
    # per-layer adjacency set this True to keep ``_adj`` and skip the
    # collapsed operator — at most ONE [N,N] matrix is ever resident per
    # model, which is what ``_DENSE_ADJ_BYTES`` is sized for.
    _needs_layer_graph = False

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        # LightGCN is entirely linear in the embeddings, so the layer-mean
        # readout mean_{l=0..L} A^l E is one matmul with the precomputed
        # operator M = (I + A + ... + A^L)/(L+1). Replaces L [N,N]@[N,D]
        # matmuls per training step (fwd AND bwd) with one each; computed
        # once per graph on device (the reference re-propagates layer by
        # layer every forward, recstudio/model/graph/lightgcn.py:53-66).
        # Skipped when the subclass overrides ``propagate`` (NCL's per-layer
        # readout never uses M) or declares ``_needs_layer_graph``.
        self._prop_m = None
        collapse = (type(self).propagate is LightGCN.propagate
                    and not self._needs_layer_graph)
        if self._adj is not None and collapse:
            # the step is HBM-bound on reading M ([N,N] f32, fwd + bwd);
            # model.prop_dtype: bf16 halves that traffic — only M's entries
            # are quantized, embeddings stay f32 and products accumulate f32
            bf16 = str(self.config["model"].get("prop_dtype", "fp32")) \
                .lower() in ("bf16", "bfloat16")
            self._prop_m = jax.block_until_ready(jax.jit(
                _mean_walk_operator, static_argnums=(1, 2))(
                    self._adj, self.config["model"]["n_layers"],
                    jnp.bfloat16 if bf16 else jnp.float32))
            self._adj = None  # M subsumes the dense adjacency — free it

    def propagate(self, params):
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
        if self._prop_m is not None:
            out = jnp.asarray(self._prop_m @ emb, dtype=emb.dtype)
        else:
            # per-layer loop: dense-adj matmuls when _adj is resident
            # (subclasses that keep the layer graph), else the edge-list
            # segment-sum kernel (graphs past the dense budget, and LightGCN
            # proper once _adj has been folded into M)
            layers = [emb]
            x = emb
            for _ in range(self.config["model"]["n_layers"]):
                x = self._gcn_layer(x)
                layers.append(x)
            out = jnp.mean(jnp.stack(layers, axis=0), axis=0)
        return out[: self.num_users], out[self.num_users:]

    def training_step(self, params, batch, rng, states):
        output = self.forward(params, batch, rng, states)
        loss = self.loss_fn(batch[self.frating], **output["score"])
        reg = l2_reg_loss_fn(
            params["user_embedding"][batch[self.fuid]],
            params["item_embedding"][batch[self.fiid]],
            params["item_embedding"][output["neg_id"].reshape(-1)])
        return loss + self.config["model"]["l2_reg_weight"] * reg
