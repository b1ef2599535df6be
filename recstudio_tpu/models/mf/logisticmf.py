"""LogisticMF: logistic matrix factorization.

Reference: recstudio/model/mf/logisticmf.py.
"""
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import PairwiseLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class LogitLoss(PairwiseLoss):
    def __init__(self, alpha: float):
        self.alpha = alpha

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        l1 = self.alpha * pos_score - (1 + self.alpha) * jax.nn.softplus(pos_score)
        l2 = jax.nn.softplus(neg_score).mean(-1)
        return -jnp.mean(l1 - l2)


class LogisticMF(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return Embedding(train_data.num_users, self.embed_dim)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return LogitLoss(self.config["train"]["alpha"])

