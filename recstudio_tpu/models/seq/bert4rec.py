"""BERT4Rec: bidirectional transformer with masked-item prediction.

Reference: recstudio/model/seq/bert4rec.py. The reference flattens masked
positions to a ragged batch; here masking stays [B, L] with static shapes —
non-masked targets get id 0, whose pos_score becomes -inf and is excluded by
the padding-aware SoftmaxLoss (the global masked-position mean is identical).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel import BaseRetriever
from ..loss_func import SoftmaxLoss
from ..module import Embedding
from ..scorer import InnerProductScorer
from .sasrec import SASRecQueryEncoder


class BERT4Rec(BaseRetriever):

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        self.mask_token = train_data.num_items

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        # one extra slot: id == num_items is the [MASK] token
        return Embedding(train_data.num_items + 1, self.embed_dim)

    def _get_query_encoder(self, train_data):
        mc = self.config["model"]
        return SASRecQueryEncoder(
            fiid=self.fiid, embed_dim=self.embed_dim,
            max_seq_len=train_data.config["max_seq_len"], n_head=mc["head_num"],
            hidden_size=mc["hidden_size"], dropout=mc["dropout"],
            activation=mc["activation"], layer_norm_eps=float(mc["layer_norm_eps"]),
            n_layer=mc["layer_num"], item_encoder=self.item_encoder,
            bidirectional=True, training_pooling_type="mask")

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return SoftmaxLoss()

    def _get_sampler(self, train_data):
        return None

    def _compute_item_vector(self, params):
        ids = jnp.arange(1, self.num_items)  # excludes [PAD] and [MASK]
        return self._apply(params, "encode_item", ids)

    def _reconstruct_train_data(self, batch, rng):
        seq = batch["in_" + self.fiid]
        pad = seq == 0
        rand = jax.random.uniform(rng, seq.shape)
        rand = jnp.where(pad, 1.0, rand)
        masked = rand < self.config["train"]["mask_ratio"]
        batch = dict(batch)
        batch["in_" + self.fiid] = jnp.where(masked, self.mask_token, seq)
        batch[self.fiid] = jnp.where(masked, seq, 0)   # 0 -> -inf pos_score
        return batch

    def training_step(self, params, batch, rng, states):
        mask_rng, step_rng = jax.random.split(rng)
        batch = self._reconstruct_train_data(batch, mask_rng)
        return super().training_step(params, batch, step_rng, states)
