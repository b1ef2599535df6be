"""DIFM: dual input-aware factorization machine.

Reference: recstudio/model/fm/difm.py — vector-wise (self-attention) and
bit-wise (MLP) factor-estimating networks jointly reweight field embeddings
and the first-order term.
"""
import flax.linen as nn
import jax

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (Embeddings, FMLayer, SelfAttentionInteractingLayer,
                          make_field_specs)


class DIFMNet(nn.Module):
    field_specs: tuple
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float
    n_head: int = 1
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        # vector-wise FEN: self-attention over fields
        att = SelfAttentionInteractingLayer(self.embed_dim, self.n_head,
                                            self.dropout, name="vector_fen")(
            emb, training=training)
        m_vec = nn.Dense(F, use_bias=False, name="p_vec")(
            att.reshape(att.shape[0], -1))
        # bit-wise FEN: MLP
        m_bit = MLPModule([F * self.embed_dim, *self.mlp_layer],
                          activation_func=self.activation, dropout=self.dropout,
                          batch_norm=self.batch_norm, name="bit_fen")(
            emb.reshape(emb.shape[0], -1), training=training)
        m_bit = nn.Dense(F, use_bias=False, name="p_bit")(m_bit)
        m = m_vec + m_bit                                       # [B, F]
        lr_emb = Embeddings(self.field_specs, 1, name="linear_emb")(batch).squeeze(-1)
        bias = self.param("bias", nn.initializers.zeros, (1,))
        lr = (lr_emb * m).sum(-1) + bias[0]
        fm = FMLayer(reduction="sum")(emb * m[..., None])
        return lr + fm


class DIFM(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        return DIFMNet(make_field_specs(self.fields, train_data), self.embed_dim,
                       tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"],
                       mc.get("n_head", 1), mc.get("batch_norm", False))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
