"""IPS-BPR: inverse-propensity-scored BPR (popularity debiasing).

The reference's debias package is an empty placeholder
(recstudio/model/debias/__init__.py is 0 bytes); this provides a working
member of the family. Following Saito et al., "Unbiased Recommender Learning
from Missing-Not-At-Random Implicit Feedback" (WSDM'20), each positive pair
is weighted by the inverse of the item's exposure propensity, estimated from
the empirical popularity: p_i ∝ (freq_i / max_freq)^gamma (gamma = 0.5
default). Weights are clipped at ``model.ips_clip`` for variance control.
"""
import jax.numpy as jnp
import numpy as np

import jax

from ...data.dataset import TripletDataset
from ..basemodel import BaseRetriever
from ..loss_func import BPRLoss
from ..module import Embedding
from ..scorer import InnerProductScorer


class IPSBPR(BaseRetriever):

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
        return BPRLoss()  # used only when the IPS weighting is disabled

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        gamma = float(self.config["model"].get("ips_gamma", 0.5))
        clip = float(self.config["model"].get("ips_clip", 100.0))
        freq = np.maximum(train_data.item_freq.astype(np.float64), 1.0)
        propensity = (freq / freq.max()) ** gamma
        self._ips_weight = jnp.asarray(
            np.minimum(1.0 / propensity, clip), jnp.float32)

    def training_step(self, params, batch, rng, states):
        output = self.forward(params, batch, rng, states)
        s = output["score"]
        w = self._ips_weight[batch[self.fiid]]                 # [B]
        diff = jax.nn.log_sigmoid(s["pos_score"][..., None] - s["neg_score"])
        # self-normalized IPS estimator of the BPR objective
        per_pair = -diff.mean(-1)                              # [B]
        return (w * per_pair).sum() / jnp.maximum(w.sum(), 1e-8)
