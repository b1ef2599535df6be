"""SimGCL: graph CL with noise-perturbed views (no graph augmentation).

Reference: recstudio/model/graph/simgcl.py. Perturbed propagation adds
sign-aligned normalized noise per layer and skips the layer-0 embedding in the
readout. Note: the reference dedups batch ids (torch.unique) before the CL
term; here the raw batch ids are used (static shapes), which only reweights
duplicates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..loss_func import l2_reg_loss_fn
from ..module.data_augmentation import _normalize, info_nce
from .lightgcn import LightGCN


class SimGCL(LightGCN):

    # the perturbed CL views propagate layer-by-layer via _gcn_layer, so the
    # dense adjacency must stay resident; LightGCN._init_model therefore
    # skips the collapsed-M precompute (one [N,N] matrix, not two)
    _needs_layer_graph = True

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _propagate_perturbed(self, params, rng):
        mc = self.config["model"]
        eps = mc["eps"]
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
        layers = []
        x = emb
        for i in range(mc["n_layers"]):
            x = self._gcn_layer(x)
            noise = jax.random.uniform(jax.random.fold_in(rng, i), x.shape)
            x = x + jnp.sign(x) * _normalize(noise) * eps
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
        u1, i1 = self._propagate_perturbed(params, rng_v1)
        u2, i2 = self._propagate_perturbed(params, rng_v2)
        neg_type = mc.get("cl_neg_type", "all")
        if neg_type == "all":
            cl = info_nce(u1[batch[self.fuid]], u2[batch[self.fuid]],
                          mc["temperature"], "cosine", "all", all_reps=u2[1:]) \
                + info_nce(i1[batch[self.fiid]], i2[batch[self.fiid]],
                           mc["temperature"], "cosine", "all", all_reps=i2[1:])
        else:
            cl = info_nce(u1[batch[self.fuid]], u2[batch[self.fuid]],
                          mc["temperature"], "cosine", neg_type) \
                + info_nce(i1[batch[self.fiid]], i2[batch[self.fiid]],
                           mc["temperature"], "cosine", neg_type)
        return loss + mc["l2_reg_weight"] * reg + mc["cl_weight"] * cl
