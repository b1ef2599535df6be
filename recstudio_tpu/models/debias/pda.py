"""PDA: popularity-bias deconfounded training (Zhang et al., SIGIR'21,
"Causal Intervention for Leveraging Popularity Bias").

Training scores are confounded on purpose — ``elu(f(u,i)) * pop_i^gamma`` —
so the embedding match f(u,i) needn't absorb popularity; at inference the
popularity term is dropped (do-calculus intervention), ranking by the
deconfounded match alone. The reference's debias package is empty; this is
a working member of the family.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class PDA(BaseRetriever):

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

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        gamma = float(self.config["model"].get("pda_gamma", 0.1))
        freq = np.maximum(train_data.item_freq.astype(np.float64), 1.0)
        self._pop_weight = jnp.asarray((freq / freq.max()) ** gamma, jnp.float32)

    def training_step(self, params, batch, rng, states):
        output = self.forward(params, batch, rng, states,
                              return_neg_id=True)
        s = output["score"]
        pos = jax.nn.elu(s["pos_score"]) + 1.0
        neg = jax.nn.elu(s["neg_score"]) + 1.0
        pos_adj = pos * self._pop_weight[batch[self.fiid]]
        neg_adj = neg * self._pop_weight[output["neg_id"]]
        return -jnp.mean(jax.nn.log_sigmoid(pos_adj[..., None] - neg_adj))
