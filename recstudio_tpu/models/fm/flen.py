"""FLEN: field-leveraged embedding network.

Reference: recstudio/model/fm/flen.py (+ ctr.py:1262 FieldWiseBiInteraction) —
fields are grouped (user-side / item-side / context); MF interactions act
across group sums, FM interactions within groups; fused with a deep MLP.
"""
import flax.linen as nn
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import (Embeddings, FMLayer, InnerProductLayer, LinearLayer,
                          make_field_specs)


class FLENNet(nn.Module):
    field_specs: tuple
    group_specs: tuple      # tuple of per-group field-spec tuples
    embed_dim: int
    mlp_layer: tuple
    activation: str
    dropout: float

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        names = [n for n, _, _ in self.field_specs]
        lr_out = LinearLayer(self.field_specs, name="linear")(batch)
        # per-group embedding slices
        group_embs = []
        for g in self.group_specs:
            idx = jnp.asarray([names.index(n) for n, _, _ in g])
            group_embs.append(emb[:, idx, :])
        M = len(group_embs)
        # MF across group sums
        mf_in = jnp.stack([g.sum(1) for g in group_embs], axis=1)     # [B, M, D]
        mf = InnerProductLayer(M, reduction=False)(mf_in)              # [B, P, D]
        mf_out = nn.Dense(1, use_bias=False, name="r_mf")(
            mf.transpose(0, 2, 1)).squeeze(-1)                         # [B, D]
        # FM within each group
        fm = jnp.stack([FMLayer()(g) for g in group_embs], axis=1)    # [B, M, D]
        fm_out = nn.Dense(1, use_bias=False, name="r_fm")(
            fm.transpose(0, 2, 1)).squeeze(-1)                         # [B, D]
        fwbi = jnp.concatenate([lr_out[:, None], fm_out + mf_out], axis=-1)
        fwbi = MLPModule([self.embed_dim + 1, self.embed_dim + 1],
                         activation_func=self.activation, dropout=self.dropout,
                         bias=False, batch_norm=True, name="fwbi_fc")(
            fwbi, training=training)
        F = len(self.field_specs)
        deep = MLPModule([F * self.embed_dim, *self.mlp_layer],
                         activation_func=self.activation, dropout=self.dropout,
                         batch_norm=True, name="mlp")(
            emb.reshape(emb.shape[0], -1), training=training)
        return nn.Dense(1, use_bias=False, name="fc")(
            jnp.concatenate([deep, fwbi], -1)).squeeze(-1)


class FLEN(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        specs = make_field_specs(self.fields, train_data)
        groups_cfg = mc.get("fields")
        if groups_cfg is None:
            groups = []
            for feat in (train_data.inter_feat, train_data.user_feat,
                         train_data.item_feat):
                if feat is not None:
                    g = make_field_specs(set(feat.fields) & set(self.fields),
                                         train_data)
                    if g:
                        groups.append(g)
        else:
            groups = [make_field_specs(set(g) & set(self.fields), train_data)
                      for g in groups_cfg]
        return FLENNet(specs, tuple(groups), self.embed_dim,
                       tuple(mc["mlp_layer"]), mc["activation"], mc["dropout"])

    def _get_loss_func(self):
        return BCEWithLogitLoss()
