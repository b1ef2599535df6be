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


class LightGCN(BaseGraphRetriever):

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
        self._prop_m = None
        if self._adj is not None:
            n_layers = self.config["model"]["n_layers"]
            power = acc = jnp.eye(self._num_nodes, dtype=jnp.float32)
            for _ in range(n_layers):
                power = self._adj @ power
                acc = acc + power
            m = acc / (n_layers + 1)
            # the step is HBM-bound on reading M ([N,N] f32, fwd + bwd);
            # model.prop_dtype: bf16 halves that traffic — only M's entries
            # are quantized, embeddings stay f32 and products accumulate f32
            if str(self.config["model"].get("prop_dtype", "fp32")).lower() \
                    in ("bf16", "bfloat16"):
                m = m.astype(jnp.bfloat16)
            self._prop_m = jax.block_until_ready(m)

    def propagate(self, params):
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
        if self._prop_m is not None:
            out = jnp.asarray(self._prop_m @ emb, dtype=emb.dtype)
        else:  # edge-list segment-sum path for graphs past the dense budget
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
