"""BPR: Bayesian Personalized Ranking matrix factorization.

Reference: recstudio/model/mf/bpr.py (user/item embedding towers, inner-product
scorer, BPR loss, uniform negatives).
"""
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class BPR(BaseRetriever):

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
        return BPRLoss()

