"""DIEN: deep interest evolution network (sequence-aware CTR ranker).

The reference ships only a forward-less DIENScorer stub
(reference recstudio/model/module/ctr.py:417-443 — ``forward`` is ``pass``)
plus the attention-gated GRU cells (module/gru.py). This is a complete
model: a GRU interest extractor over the behavior sequence, target-item
attention scores, and an AUGRU interest-evolution layer whose final hidden
state joins the target embedding in the prediction MLP.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import AUGRU, Embedding, MLPModule
from ..module.layers import GRULayer


class DIENNet(nn.Module):
    fiid: str
    num_items: int
    embed_dim: int
    hidden_size: int
    fc_mlp: tuple
    activation: str = "sigmoid"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, training: bool = False):
        d = self.embed_dim
        item_emb = Embedding(self.num_items, d, name="item_embedding")
        item_bias = Embedding(self.num_items, 1, name="item_bias")
        hist = batch["in_" + self.fiid]                           # [B, L]
        seq_emb = item_emb(hist)                                  # [B, L, D]
        target_emb = item_emb(batch[self.fiid])                   # [B, D]
        bias = item_bias(batch[self.fiid]).squeeze(-1)
        pad = hist == 0

        # interest extraction: plain GRU over the behavior sequence
        interests = GRULayer(d, self.hidden_size, name="extractor")(seq_emb)
        if isinstance(interests, tuple):
            interests = interests[0]

        # attention of the target over extracted interests (padded -> 0)
        t_proj = nn.Dense(self.hidden_size, name="target_proj")(target_emb)
        logits = (interests * t_proj[:, None, :]).sum(-1) / jnp.sqrt(
            jnp.asarray(self.hidden_size, jnp.float32))
        logits = jnp.where(pad, jnp.finfo(jnp.float32).min, logits)
        att = jax.nn.softmax(logits, axis=-1)
        att = jnp.where(pad, 0.0, att)

        # interest evolution: AUGRU gated by the attention scores
        _, final = AUGRU(self.hidden_size, name="evolution")(interests, att)

        cat = jnp.concatenate([final, t_proj, final * t_proj], axis=-1)
        h = MLPModule([3 * self.hidden_size, *self.fc_mlp],
                      activation_func=self.activation, dropout=self.dropout,
                      name="fc_mlp")(cat, training=training)
        return nn.Dense(1, name="fc")(h).squeeze(-1) + bias


class DIEN(BaseRanker):

    def _set_data_field(self, data):
        pass  # keep the dataset's default fields (like DIN)

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DIENNet(self.fiid, train_data.num_items, self.embed_dim,
                       int(mc.get("hidden_size", self.embed_dim)),
                       tuple(mc["fc_mlp"]), mc.get("activation", "sigmoid"),
                       mc.get("dropout", 0.0))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
