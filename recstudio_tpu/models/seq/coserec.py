"""CoSeRec: robust-augmentation contrastive sequential recommendation.

Reference: recstudio/model/seq/coserec.py + module/data_augmentation.py:684-943.
Informative augmentations (similar-item insert/substitute) use an item-item
similarity model: offline co-occurrence until the warm-up ends, then online
embedding similarity refreshed once per epoch (both reduced to a top-1
neighbor table, as the reference's `most_similar(top_k=1)`). Short sequences
only get insert/substitute; long sequences additionally crop/mask/reorder.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import SeqToSeqDataset
from ..loss_func import BinaryCrossEntropyLoss
from ..module import SeqPoolingLayer
from ..module.data_augmentation import (info_nce, item_crop, item_insert,
                                        item_mask, item_reorder,
                                        item_substitute)
from .cl4srec import CL4SRec


class CoSeRec(CL4SRec):

    @staticmethod
    def _get_dataset_class():
        return SeqToSeqDataset

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        self._offline_top1 = jnp.asarray(self._cooccurrence_top1(train_data))

    def _cooccurrence_top1(self, train_data) -> np.ndarray:
        """Offline similarity: most co-occurring other item per item."""
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(self.fuid))[sub]
        items = np.asarray(train_data.inter_feat.get_col(self.fiid))[sub]
        n = self.num_items
        co = np.zeros((n, n), dtype=np.float32)
        order = np.argsort(users, kind="stable")
        u_s, i_s = users[order], items[order]
        bounds = np.hstack([[0], np.flatnonzero(u_s[1:] != u_s[:-1]) + 1, [len(u_s)]])
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            basket = np.unique(i_s[lo:hi])
            if len(basket) > 1:
                co[np.ix_(basket, basket)] += 1
        np.fill_diagonal(co, 0)
        co[:, 0] = -1  # never propose [PAD]
        top1 = co.argmax(axis=1).astype(np.int32)
        top1[0] = 0
        # items with no co-occurrence fall back to themselves
        no_co = co.max(axis=1) <= 0
        top1[no_co] = np.arange(n)[no_co]
        return top1

    def _epoch_refresh(self, nepoch: int):
        super()._epoch_refresh(nepoch)
        mc = self.config["model"]
        warm = mc.get("augmentation_warm_up_epochs", 120)
        if nepoch + 1 >= warm + 1:
            # online similarity: top-1 embedding neighbor per item
            @jax.jit
            def online_top1(params):
                vec = self._compute_item_vector(params)          # [N-1, D]
                vn = vec * jax.lax.rsqrt((vec * vec).sum(-1, keepdims=True) + 1e-12)
                sim = vn @ vn.T - 2.0 * jnp.eye(vn.shape[0])
                return jnp.concatenate(
                    [jnp.zeros(1, jnp.int32), jnp.argmax(sim, 1).astype(jnp.int32) + 1])
            self.states["top1_sim"] = online_top1(self.params)
        elif "top1_sim" not in self.states:
            self.states["top1_sim"] = self._offline_top1

    def _augment_view(self, rng, seq, seqlen, top1):
        mc = self.config["model"]
        thresh = mc.get("augment_threshold", 4)
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        ins = item_insert(k1, seq, seqlen, top1, mc.get("insert_rate", 0.4))
        sub = item_substitute(k2, seq, seqlen, top1, mc.get("substitute_rate", 0.1))
        crop = item_crop(k3, seq, seqlen)
        mask = item_mask(k4, seq, seqlen, mask_id=self.mask_id)
        reorder = item_reorder(k5, seq, seqlen)
        short_choice = jax.random.randint(k6, (seq.shape[0],), 0, 2)
        long_choice = jax.random.randint(jax.random.fold_in(k6, 1),
                                         (seq.shape[0],), 0, 5)
        variants = [ins, sub, crop, mask, reorder]
        is_long = seqlen > thresh
        choice = jnp.where(is_long, long_choice, short_choice)
        out_seq = variants[0][0]
        out_len = variants[0][1]
        for i in range(1, 5):
            sel = (choice == i)[:, None]
            out_seq = jnp.where(sel, variants[i][0], out_seq)
            out_len = jnp.where(choice == i, variants[i][1], out_len)
        return out_seq, out_len

    def training_step(self, params, batch, rng, states):
        from .sasrec import SASRec
        r_main, r_i, r_j, r_enc = jax.random.split(rng, 4)
        base_loss = SASRec.training_step(self, params, batch, r_main, states)
        mc = self.config["model"]
        seq, seqlen = batch["in_" + self.fiid], batch["seqlen"]
        top1 = states["top1_sim"]
        seq_i, len_i = self._augment_view(r_i, seq, seqlen, top1)
        seq_j, len_j = self._augment_view(jax.random.fold_in(r_j, 3), seq, seqlen, top1)

        def encode(s, l, key):
            feat = {"in_" + self.fiid: s, "seqlen": l}
            out = self.net.apply({"params": params}, feat, training=True,
                                 rngs={"dropout": key}, method=self.net.encode_query)
            return SeqPoolingLayer(pooling_type="mean")(out, l)

        zi = encode(seq_i, len_i, r_enc)
        zj = encode(seq_j, len_j, jax.random.fold_in(r_enc, 1))
        cl = info_nce(zi, zj, mc["temperature"], "inner_product", "batch_both")
        return base_loss + mc["cl_weight"] * cl
