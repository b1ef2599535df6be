"""NCL: neighborhood-enriched contrastive learning.

Reference: recstudio/model/graph/ncl.py + module/data_augmentation.py:453-523.
Structure CL aligns layer-0 and layer-2h embeddings; prototype (semantic) CL
aligns embeddings with their k-means centroid. The reference's faiss.Kmeans
E-step becomes the on-device JAX k-means, refreshed once per epoch after the
warm-up (reference ncl.py:96).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ...ops.kmeans import kmeans
from ..loss_func import l2_reg_loss_fn
from ..module.data_augmentation import info_nce
from .lightgcn import LightGCN


class NCL(LightGCN):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _propagate_layers(self, params):
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
        layers = [emb]
        x = emb
        for _ in range(self.config["model"]["n_layers"]):
            x = self._gcn_layer(x)
            layers.append(x)
        return layers

    def propagate(self, params):
        layers = self._propagate_layers(params)
        out = jnp.mean(jnp.stack(layers, axis=0), axis=0)
        return out[: self.num_users], out[self.num_users:]

    def _epoch_refresh(self, nepoch: int):
        super()._epoch_refresh(nepoch)
        mc = self.config["model"]
        warm = self.config["train"].get("warm_up_epoch", 0)
        self.states["proto_on"] = jnp.asarray(1.0 if nepoch >= warm else 0.0)
        # E-step: cluster raw embeddings (reference runs it every num_m_epoch)
        if nepoch < 0 or nepoch >= warm or "user_centroids" not in self.states:
            k = mc["num_clusters"]
            rng = self.next_rng()
            u_c, u_a = kmeans(rng, self.params["user_embedding"][1:], k)
            i_c, i_a = kmeans(jax.random.fold_in(rng, 1),
                              self.params["item_embedding"][1:], k)
            pad = jnp.zeros(1, dtype=u_a.dtype)
            self.states.update({
                "user_centroids": u_c, "item_centroids": i_c,
                "user_2cluster": jnp.concatenate([pad, u_a]),
                "item_2cluster": jnp.concatenate([pad, i_a])})

    def training_step(self, params, batch, rng, states):
        mc = self.config["model"]
        layers = self._propagate_layers(params)
        out = jnp.mean(jnp.stack(layers, axis=0), axis=0)
        user_all, item_all = out[: self.num_users], out[self.num_users:]
        query = user_all[batch[self.fuid]]
        pos_vec = item_all[batch[self.fiid]]
        pos_score = self.score_func(query, pos_vec)
        log_pos_prob, neg_ids, log_neg_prob = self.sampler(
            states.get("sampler", ()), rng, jax.lax.stop_gradient(query),
            self.neg_count, pos_items=batch[self.fiid])
        neg_score = self.score_func(query, item_all[neg_ids])
        loss = self.loss_fn(batch[self.frating], pos_score, log_pos_prob,
                            neg_score, log_neg_prob)
        reg = l2_reg_loss_fn(params["user_embedding"][batch[self.fuid]],
                             params["item_embedding"][batch[self.fiid]],
                             params["item_embedding"][neg_ids.reshape(-1)])
        # structure CL: layer-0 vs layer-2*hyper_layers
        center = layers[0]
        context = layers[min(mc["hyper_layers"] * 2, len(layers) - 1)]
        u_cen, i_cen = center[: self.num_users], center[self.num_users:]
        u_ctx, i_ctx = context[: self.num_users], context[self.num_users:]
        structure = info_nce(u_ctx[batch[self.fuid]], u_cen[batch[self.fuid]],
                             mc["temperature"], "cosine", "all", all_reps=u_cen[1:]) \
            + mc["alpha"] * info_nce(i_ctx[batch[self.fiid]], i_cen[batch[self.fiid]],
                                     mc["temperature"], "cosine", "all", all_reps=i_cen[1:])
        # prototype CL (after warm-up)
        u2c = states["user_2cluster"][batch[self.fuid]]
        i2c = states["item_2cluster"][batch[self.fiid]]
        proto = info_nce(u_cen[batch[self.fuid]], states["user_centroids"][u2c],
                         mc["temperature"], "cosine", "all",
                         all_reps=states["user_centroids"]) \
            + mc["alpha"] * info_nce(i_cen[batch[self.fiid]], states["item_centroids"][i2c],
                                     mc["temperature"], "cosine", "all",
                                     all_reps=states["item_centroids"])
        return loss + mc["l2_reg_weight"] * reg + mc["ssl_reg"] * structure \
            + states["proto_on"] * mc["proto_reg"] * proto
