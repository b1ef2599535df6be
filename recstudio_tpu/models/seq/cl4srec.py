"""CL4SRec: contrastive learning for sequential recommendation.

Reference: recstudio/model/seq/cl4srec.py + module/data_augmentation.py:573.
Two stochastic augmentations (crop / mask / reorder) of each sequence are
encoded and pulled together with a batch-negative InfoNCE on top of the
SASRec next-item objective over SeqToSeqDataset windows.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import SeqToSeqDataset
from ..module.data_augmentation import info_nce, item_crop, item_mask, item_reorder
from ..module import Embedding, SeqPoolingLayer
from .sasrec import SASRec, SASRecQueryEncoder


class CL4SRec(SASRec):

    @staticmethod
    def _get_dataset_class():
        return SeqToSeqDataset

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        self.mask_id = train_data.num_items  # the extra row is the mask token

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items + 1, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return SASRecQueryEncoder(
            fiid=self.fiid, embed_dim=self.embed_dim,
            max_seq_len=train_data.config["max_seq_len"], n_head=mc["head_num"],
            hidden_size=mc["hidden_size"], dropout=mc["dropout_rate"],
            activation=mc["activation"], layer_norm_eps=float(mc["layer_norm_eps"]),
            n_layer=mc["layer_num"], item_encoder=self.item_encoder,
            training_pooling_type="origin")

    def _compute_item_vector(self, params):
        ids = jnp.arange(1, self.num_items)  # exclude [PAD] and [MASK]
        return self._apply(params, "encode_item", ids)

    def _augment(self, rng, seq, seqlen):
        kind = self.config["model"].get("augment_type", "item_crop")
        if kind == "item_crop":
            return item_crop(rng, seq, seqlen, self.config["model"].get("tau", 0.2))
        if kind == "item_mask":
            return item_mask(rng, seq, seqlen, mask_id=self.mask_id)
        if kind == "item_reorder":
            return item_reorder(rng, seq, seqlen)
        raise ValueError(f"unknown augment_type {kind}")

    def training_step(self, params, batch, rng, states):
        r_main, r_i, r_j, r_enc = jax.random.split(rng, 4)
        base_loss = super().training_step(params, batch, r_main, states)
        mc = self.config["model"]
        seq, seqlen = batch["in_" + self.fiid], batch["seqlen"]
        seq_i, len_i = self._augment(r_i, seq, seqlen)
        seq_j, len_j = self._augment(jax.random.fold_in(r_j, 1), seq, seqlen)

        def encode(s, l, key):
            feat = {"in_" + self.fiid: s, "seqlen": l}
            out = self.net.apply({"params": params}, feat, training=True,
                                 rngs={"dropout": key},
                                 method=self.net.encode_query)  # 'origin' pooling
            return SeqPoolingLayer(pooling_type="mean")(out, l)

        zi = encode(seq_i, len_i, r_enc)
        zj = encode(seq_j, len_j, jax.random.fold_in(r_enc, 1))
        cl = info_nce(zi, zj, mc["temperature"], "inner_product", "batch_both")
        return base_loss + mc["cl_weight"] * cl
