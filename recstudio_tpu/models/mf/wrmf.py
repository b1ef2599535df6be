"""WRMF: weighted regularized matrix factorization via ALS.

Reference: recstudio/model/mf/wrmf.py — per-batch torch.linalg.solve with
in-place embedding writes. TPU re-design: each half-sweep (all users, or all
items) is ONE jitted device call — the per-row D x D normal equations are
built with a batched einsum over the padded interaction lists (ALSDataset) and
solved with a batched Cholesky-backed ``jnp.linalg.solve``; the embedding
table is functionally updated with a scatter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...data.advance_dataset import ALSDataset
from ..basemodel import BaseRetriever
from ..module import Embedding
from ..scorer import InnerProductScorer


class WRMF(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return ALSDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return Embedding(train_data.num_users, self.embed_dim)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return None

    def _get_sampler(self, train_data):
        return None

    def _get_optimizers(self):
        return None

    def _get_train_loaders(self, train_data, ddp=False):
        def pack(view, key_field, val_field):
            n = len(view.data_index)
            batch = view._get_pos_batch(np.arange(n))
            return {"keys": jnp.asarray(batch[key_field]),
                    "vals": jnp.asarray(batch[val_field]),
                    "ratings": jnp.asarray(batch[self.frating])}
        fuid, fiid = train_data.fuid, train_data.fiid
        return [pack(train_data, fuid, fiid),
                pack(train_data.transpose(), fiid, fuid)]

    @partial(jax.jit, static_argnums=(0, 3))
    def _als_sweep(self, params, data, update_query: bool):
        alpha = float(self.config["train"]["alpha"])
        lam = float(self.config["train"]["lambda"])
        own = "query_encoder" if update_query else "item_encoder"
        other = "item_encoder" if update_query else "query_encoder"
        other_table = params[other]["embedding"]
        own_table = params[own]["embedding"]
        d = other_table.shape[-1]
        GtG = other_table.T @ other_table                  # D x D
        eye = lam * jnp.eye(d, dtype=own_table.dtype)

        emb = other_table[data["vals"]]                    # [B, L, D]
        r = (data["ratings"] > 0).astype(own_table.dtype)  # [B, L]; pads are 0
        A = alpha * jnp.einsum("bld,ble->bde", emb, emb) + (GtG + eye)
        b = jnp.einsum("bld,bl->bd", emb, r) * (alpha + 1.0)
        x = jnp.linalg.solve(A, b[..., None]).squeeze(-1)  # [B, D]
        new_table = own_table.at[data["keys"]].set(x)
        return {**params, own: {**params[own], "embedding": new_table}}

    def training_epoch(self, nepoch: int) -> float:
        data = self.trainloaders[nepoch % 2]
        self.params = self._als_sweep(self.params, data, nepoch % 2 == 0)
        return 0.0
