"""ItemKNN: top-k item-item similarity model (cosine / jaccard).

Reference: recstudio/model/mf/itemknn.py — the reference walks CSC columns on
the host; here the Gram matrix, similarity normalization and per-column top-k
pruning run as dense device ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ease import EASE


class ItemKNN(EASE):

    def training_epoch(self, nepoch: int) -> float:
        cfg = self.config["train"]
        data, _ = self.current_epoch_trainloaders(nepoch)
        R = jnp.asarray(data["user_item_matrix"].toarray(), jnp.float32)
        knn = int(cfg["knn"])
        sim_kind = cfg.get("similarity", "cosine")

        @jax.jit
        def build(R):
            G = R.T @ R
            G = G - jnp.diag(jnp.diag(G))
            if sim_kind == "cosine":
                norm = jnp.sqrt(jnp.sum(R * R, axis=0))
                S = G / (norm[:, None] * norm[None, :] + 1e-6)
            elif sim_kind == "jaccard":
                nz = (R > 0).sum(0).astype(jnp.float32)
                S = G / (nz[:, None] + nz[None, :] - G + 1e-6)
            else:
                raise ValueError("similarity must be cosine or jaccard")
            # keep only the top-knn neighbours per column
            k = min(knn, S.shape[0])
            thresh = jax.lax.top_k(S.T, k)[0][:, -1]       # per-column kth value
            B = jnp.where(S >= thresh[None, :], S, 0.0)
            B = B - jnp.diag(jnp.diag(B))
            return B

        self.states["R"] = R
        self.states["B"] = build(R)
        return 0.0
