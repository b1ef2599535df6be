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

    def propagate(self, params):
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
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
