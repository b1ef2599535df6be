"""CML: collaborative metric learning (euclidean space, rank-weighted hinge).

Reference: recstudio/model/mf/cml.py.
"""
import jax.numpy as jnp

from ...data.advance_dataset import ALSDataset
from ..basemodel import BaseRetriever
from ..loss_func import PairwiseLoss
from ..module import Embedding
from ..scorer import EuclideanScorer


class CMLoss(PairwiseLoss):
    def __init__(self, margin: float = 2.0, use_rank_weight=False, n_items: int = None):
        self.margin = margin
        self.use_rank_weight = use_rank_weight
        self.n_items = (n_items - 1) if n_items else None

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        # padded positives (-inf) must never win the max; flip them to +inf so
        # their hinge is zero
        pos = jnp.where(jnp.isinf(pos_score), jnp.inf, pos_score)
        loss = jnp.maximum(jnp.max(neg_score, axis=-1)[..., None] - pos + self.margin, 0.0)
        if self.use_rank_weight is not None:
            impostors = (neg_score[..., None, :] - pos_score[..., None] + self.margin) > 0
            rank = impostors.astype(jnp.float32).mean(-1) * self.n_items
            return jnp.mean(loss * jnp.log(rank + 1.0))
        return jnp.mean(loss)


class CML(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return ALSDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return Embedding(train_data.num_users, self.embed_dim)

    def _get_score_func(self):
        return EuclideanScorer()

    def _get_loss_func(self, train_data):
        return CMLoss(self.config["model"]["margin"],
                      self.config["model"]["use_rank_weight"],
                      train_data.num_items)

