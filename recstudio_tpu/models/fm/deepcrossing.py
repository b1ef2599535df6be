"""DeepCrossing: residual MLP units over stacked feature embeddings.

Reference: recstudio/model/fm/deepcrossing.py.
"""
import flax.linen as nn
import jax

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class DeepCrossingNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    hidden_dims: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        x = emb.reshape(emb.shape[0], -1)
        width = F * self.embed_dim
        for i, hidden in enumerate(self.hidden_dims):
            res = MLPModule([width, hidden, width],
                            activation_func=self.activation,
                            last_activation=False, last_bn=False,
                            name=f"residual_{i}")(x, training=training)
            x = jax.nn.relu(x + res)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(1, name="fc")(x).squeeze(-1)


class DeepCrossing(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DeepCrossingNet(make_field_specs(self.fields, train_data),
                               self.embed_dim, tuple(mc["hidden_dims"]),
                               mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
