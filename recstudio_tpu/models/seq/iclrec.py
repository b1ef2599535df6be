"""ICLRec: intent contrastive learning for sequential recommendation.

Reference: recstudio/model/seq/iclrec.py + module/data_augmentation.py:608.
The per-epoch faiss intent clustering becomes the on-device JAX k-means over
mean-pooled sequence representations; intent assignment is a nearest-centroid
argmin inside the jitted step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import SeqToSeqDataset
from ...ops.kmeans import kmeans
from ..module import SeqPoolingLayer
from ..module.data_augmentation import (info_nce, item_crop, item_mask,
                                        item_random, item_reorder)
from .cl4srec import CL4SRec


class ICLRec(CL4SRec):

    @staticmethod
    def _get_dataset_class():
        return SeqToSeqDataset

    def _augment(self, rng, seq, seqlen):
        kind = self.config["model"].get("augment_type", "item_random")
        if kind == "item_random":
            return item_random(rng, seq, seqlen, mask_id=self.mask_id)
        if kind == "item_crop":
            return item_crop(rng, seq, seqlen)
        if kind == "item_mask":
            return item_mask(rng, seq, seqlen, mask_id=self.mask_id)
        if kind == "item_reorder":
            return item_reorder(rng, seq, seqlen)
        raise ValueError(f"unknown augment_type {kind}")

    def _encode_mean(self, params, seq, seqlen, rng, training=True):
        feat = {"in_" + self.fiid: seq, "seqlen": seqlen}
        rngs = {"dropout": rng} if training else None
        out = self.net.apply({"params": params}, feat, training=training,
                             rngs=rngs, method=self.net.encode_query)
        if out.ndim == 3:  # 'origin' pooling during training
            out = SeqPoolingLayer(pooling_type="mean")(out, seqlen)
        return out

    def _epoch_refresh(self, nepoch: int):
        super()._epoch_refresh(nepoch)
        # intent clustering over all train sequences (reference train_kmeans)
        mc = self.config["model"]
        arrays = getattr(self, "_scan_arrays", None)
        if arrays is None:
            n = len(self._train_data.data_index)
            batch = self._train_data._get_pos_batch(np.arange(n))
            arrays = {k: jnp.asarray(v) for k, v in batch.items()}
            self._scan_arrays_cache = arrays
        seqs = arrays["in_" + self.fiid]
        lens = arrays["seqlen"]

        @jax.jit
        def encode_all(params):
            return self._encode_mean(params, seqs, lens, None, training=False)

        reps = encode_all(self.params)
        centroids, _ = kmeans(self.next_rng(), reps, mc["num_intent_clusters"])
        self.states["intent_centroids"] = centroids

    def training_step(self, params, batch, rng, states):
        from .sasrec import SASRec
        r_main, r_i, r_j, r_enc = jax.random.split(rng, 4)
        base_loss = SASRec.training_step(self, params, batch, r_main, states)
        mc = self.config["model"]
        seq, seqlen = batch["in_" + self.fiid], batch["seqlen"]
        seq_i, len_i = self._augment(r_i, seq, seqlen)
        seq_j, len_j = self._augment(jax.random.fold_in(r_j, 1), seq, seqlen)
        zi = self._encode_mean(params, seq_i, len_i, r_enc)
        zj = self._encode_mean(params, seq_j, len_j, jax.random.fold_in(r_enc, 1))
        instance = 0.5 * (
            info_nce(zi, zj, mc["temperature"], "inner_product", "batch_both")
            + info_nce(zj, zi, mc["temperature"], "inner_product", "batch_both"))
        # intent CL: align augmented views with the sequence's intent centroid
        centroids = states["intent_centroids"]
        seq_rep = jax.lax.stop_gradient(
            self._encode_mean(params, seq, seqlen, None, training=False))
        d = (seq_rep ** 2).sum(-1, keepdims=True) - 2 * seq_rep @ centroids.T \
            + (centroids ** 2).sum(-1)
        intent_ids = jnp.argmin(d, axis=-1)
        seq2intent = centroids[intent_ids]
        intent = 0.5 * (
            info_nce(zi, seq2intent, mc["temperature"], "inner_product",
                     "batch_both", instance_labels=intent_ids)
            + info_nce(zj, seq2intent, mc["temperature"], "inner_product",
                       "batch_both", instance_labels=intent_ids))
        return base_loss + mc["cl_weight"] * instance \
            + mc["intent_cl_weight"] * intent
