"""SGL: self-supervised graph learning (edge-dropout contrastive views).

Reference: recstudio/model/graph/sgl.py + module/data_augmentation.py:403-452.
Edge dropout keeps the edge list static-shape by zeroing dropped messages
(inverted-dropout scaling), which matches the expectation of the reference's
sparse-graph resampling.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..loss_func import l2_reg_loss_fn
from ..module.data_augmentation import info_nce
from .lightgcn import LightGCN


class SGL(LightGCN):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _dropped_layer(self, emb, keep_mask):
        src, dst = self._edges
        ratio = self.config["model"]["ssl_ratio"]
        msg = emb[src] * self._edge_norm[src][:, None]
        msg = jnp.where(keep_mask[:, None], msg / (1.0 - ratio), 0.0)
        out = jax.ops.segment_sum(msg, dst, num_segments=self._num_nodes)
        return out * self._edge_norm[:, None]

    def _propagate_view(self, params, rng):
        mc = self.config["model"]
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
        n_edges = self._edges[0].shape[0]
        layers = [emb]
        x = emb
        rw = mc.get("aug_type", "ED") == "RW"
        keep0 = jax.random.bernoulli(rng, 1.0 - mc["ssl_ratio"], (n_edges,))
        for i in range(mc["n_layers"]):
            keep = jax.random.bernoulli(jax.random.fold_in(rng, i + 1),
                                        1.0 - mc["ssl_ratio"], (n_edges,)) if rw else keep0
            x = self._dropped_layer(x, keep)
            layers.append(x)
        out = jnp.mean(jnp.stack(layers, axis=0), axis=0)
        return out[: self.num_users], out[self.num_users:]

    def training_step(self, params, batch, rng, states):
        rng_main, rng_v1, rng_v2 = jax.random.split(rng, 3)
        output = self.forward(params, batch, rng_main, states)
        loss = self.loss_fn(batch[self.frating], **output["score"])
        reg = l2_reg_loss_fn(params["user_embedding"][batch[self.fuid]],
                             params["item_embedding"][batch[self.fiid]],
                             params["item_embedding"][output["neg_id"].reshape(-1)])
        mc = self.config["model"]
        u1, i1 = self._propagate_view(params, rng_v1)
        u2, i2 = self._propagate_view(params, rng_v2)
        cl = info_nce(u1[batch[self.fuid]], u2[batch[self.fuid]],
                      mc["temperature"], "cosine", "all", all_reps=u2[1:]) \
            + info_nce(i1[batch[self.fiid]], i2[batch[self.fiid]],
                       mc["temperature"], "cosine", "all", all_reps=i2[1:])
        return loss + mc["l2_reg_weight"] * reg + mc["ssl_reg"] * cl
