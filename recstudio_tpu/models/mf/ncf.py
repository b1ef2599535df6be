"""NCF: neural collaborative filtering (GMF / MLP / fusion scorers).

Reference: recstudio/model/mf/ncf.py.
"""
from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BinaryCrossEntropyLoss
from ..module import Embedding, MLPModule
from ..scorer import FusionMFMLPScorer, GMFScorer, MLPScorer


class NCF(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return Embedding(train_data.num_users, self.embed_dim)

    def _get_score_func(self):
        mc = self.config["model"]
        mode = mc["score_mode"]
        assert mode in ("mlp", "mf", "fusion"), \
            "NCF score_mode must be one of ['mlp', 'mf', 'fusion']"
        if mode == "mlp":
            return MLPScorer(MLPModule(
                [self.embed_dim * 2] + mc["mlp_hidden_size"] + [1],
                activation_func=mc["activation"], dropout=mc["dropout"],
                last_activation=False))
        if mode == "mf":
            return GMFScorer(self.embed_dim, activation=mc["activation"])
        mlp = MLPModule([self.embed_dim * 2] + mc["mlp_hidden_size"],
                        activation_func=mc["activation"], dropout=mc["dropout"])
        return FusionMFMLPScorer(emb_dim=self.embed_dim,
                                 hidden_size=mc["mlp_hidden_size"][-1],
                                 mlp=mlp, activation=mc["activation"])

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()

