"""EASE: closed-form ridge-regression item model.

Reference: recstudio/model/mf/ease.py (G = R^T R + lambda*I; B = P/-diag(P),
diag(B)=0). The reference solves on CPU with numpy; here the Gram matrix,
inverse and scoring all run on device (jnp.linalg), and evaluation reuses the
standard jitted topk path with a linear-model scorer: query = the user's
interaction row, catalog matrix = B[:, 1:].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever


class EASE(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    # -- linear models have no parametric towers ------------------------
    def _init_model(self, train_data, drop_unused_field: bool = True):
        from .recommender_helpers import init_linear_retriever
        init_linear_retriever(self, train_data)

    def _init_parameter(self, train_data):
        self.params = {}

    def _get_optimizers(self):
        return None

    def _get_loss_func(self):
        return None

    def _get_sampler(self, train_data):
        return None

    def _epoch_refresh(self, nepoch: int):
        pass

    def _get_train_loaders(self, train_data, ddp=False):
        R = train_data.get_graph(0, "csr")
        return {"user_item_matrix": R}

    def current_epoch_trainloaders(self, nepoch):
        return self.trainloaders, False

    # -- closed-form "training" -----------------------------------------
    def training_epoch(self, nepoch: int) -> float:
        data, _ = self.current_epoch_trainloaders(nepoch)
        R = jnp.asarray(data["user_item_matrix"].toarray(), jnp.float32)

        @jax.jit
        def solve(R):
            G = R.T @ R
            lam = float(self.config["train"]["lambda"])
            G = G + lam * jnp.eye(G.shape[0], dtype=G.dtype)
            P = jnp.linalg.inv(G)
            B = P / (-jnp.diag(P))[None, :]
            B = B - jnp.diag(jnp.diag(B))
            resid = jnp.linalg.norm(R - R @ B)
            return B, resid

        B, resid = solve(R)
        self.states["R"] = R
        self.states["B"] = B
        return float(resid)

    # -- linear top-k -----------------------------------------------------
    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        query = states["R"][batch[self.fuid]]                 # [B, N]
        scores = query @ states["B"][:, 1:]                    # [B, N-1]
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items
