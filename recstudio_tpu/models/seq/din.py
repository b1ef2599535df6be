"""DIN: deep interest network (sequence-aware CTR ranker).

Reference: recstudio/model/seq/din.py:18-83 — activation-unit attention of the
target item over the behavior sequence, Dice activations, pointwise BCE.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import SeqDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import AttentionLayer, Embedding, MLPModule
from ..module.layers import SimpleBatchNorm


class DINNet(nn.Module):
    fiid: str
    num_items: int
    embed_dim: int
    attention_mlp: tuple
    fc_mlp: tuple
    activation: str = "dice"
    dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        d = self.embed_dim
        item_emb = Embedding(self.num_items, d, name="item_embedding")
        item_bias = Embedding(self.num_items, 1, name="item_bias")
        seq_emb = item_emb(batch["in_" + self.fiid])            # [B, L, D]
        target_emb = item_emb(batch[self.fiid])                 # [B, D]
        bias = item_bias(batch[self.fiid]).squeeze(-1)
        L = seq_emb.shape[1]
        t = jnp.broadcast_to(target_emb[:, None, :], seq_emb.shape)
        key = jnp.concatenate([t, t * seq_emb, t - seq_emb], axis=-1)
        attn_seq = AttentionLayer(
            3 * d, d, mlp_layers=list(self.attention_mlp),
            activation=self.activation, name="activation_unit")(
            target_emb[:, None, :], key, seq_emb,
            key_padding_mask=batch["in_" + self.fiid] == 0,
            softmax=False, training=training).squeeze(1)
        if self.batch_norm:
            attn_seq = SimpleBatchNorm(name="norm_bn")(attn_seq, training)
        attn_seq = nn.Dense(d, name="norm_fc")(attn_seq)
        cat = jnp.concatenate([attn_seq, target_emb, target_emb * attn_seq], -1)
        h = MLPModule([3 * d, *self.fc_mlp], activation_func=self.activation,
                      dropout=self.dropout, batch_norm=self.batch_norm,
                      name="dense_mlp")(cat, training=training)
        return nn.Dense(1, name="fc")(h).squeeze(-1) + bias


class DIN(BaseRanker):

    def _set_data_field(self, data):
        pass  # keep the dataset's default fields (reference seq/din.py:39)

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DINNet(self.fiid, train_data.num_items, self.embed_dim,
                      tuple(mc["attention_mlp"]), tuple(mc["fc_mlp"]),
                      mc["activation"], mc["dropout"], mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
