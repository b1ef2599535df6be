"""FinalMLP: two-stream MLP with feature selection and bilinear fusion.

Reference: recstudio/model/fm/finalmlp.py (+ ctr.py:1203 FeatureSelection,
:1236 MultiHeadBilinearFusion).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..basemodel.baseranker import BaseRanker
from ..loss_func import BCEWithLogitLoss
from ..module import MLPModule
from ..module.ctr import Embeddings, make_field_specs


class MultiHeadBilinearFusion(nn.Module):
    n_head: int
    dim1: int
    dim2: int

    @nn.compact
    def __call__(self, x1, x2):
        lr = nn.Dense(1, use_bias=False, name="lr1")(x1) \
            + nn.Dense(1, use_bias=False, name="lr2")(x2)
        d1, d2 = self.dim1 // self.n_head, self.dim2 // self.n_head
        h1 = x1.reshape(-1, self.n_head, d1)
        h2 = x2.reshape(-1, self.n_head, d2)
        W = self.param("bilinear", nn.initializers.normal(0.02),
                       (self.n_head, d1, d2))
        b = self.param("bilinear_bias", nn.initializers.zeros, (self.n_head,))
        blr = jnp.einsum("bhd,hde,bhe->bh", h1, W, h2) + b
        return lr.squeeze(-1) + blr.sum(-1)


class FinalMLPNet(nn.Module):
    field_specs: tuple
    stream1_specs: tuple
    stream2_specs: tuple
    embed_dim: int
    mlp_layer1: tuple
    mlp_layer2: tuple
    activation1: str
    activation2: str
    dropout1: float
    dropout2: float
    batch_norm1: bool
    batch_norm2: bool
    fs_mlp_layer: tuple
    n_head: int
    feature_selection: bool = True

    @nn.compact
    def __call__(self, batch, training: bool = False):
        F = len(self.field_specs)
        emb = Embeddings(self.field_specs, self.embed_dim, name="embedding")(batch)
        flat = emb.reshape(emb.shape[0], -1)
        width = F * self.embed_dim
        if self.feature_selection:
            g1 = Embeddings(self.stream1_specs, self.embed_dim, name="fs_emb1")(batch)
            g2 = Embeddings(self.stream2_specs, self.embed_dim, name="fs_emb2")(batch)
            gate1 = 2 * jax.nn.sigmoid(MLPModule(
                [g1.shape[1] * self.embed_dim, *self.fs_mlp_layer, width],
                activation_func="relu", last_activation=False, name="fs_gate1")(
                g1.reshape(g1.shape[0], -1), training=training))
            gate2 = 2 * jax.nn.sigmoid(MLPModule(
                [g2.shape[1] * self.embed_dim, *self.fs_mlp_layer, width],
                activation_func="relu", last_activation=False, name="fs_gate2")(
                g2.reshape(g2.shape[0], -1), training=training))
            e1, e2 = gate1 * flat, gate2 * flat
        else:
            e1 = e2 = flat
        o1 = MLPModule([width, *self.mlp_layer1], activation_func=self.activation1,
                       dropout=self.dropout1, batch_norm=self.batch_norm1,
                       name="mlp1")(e1, training=training)
        o2 = MLPModule([width, *self.mlp_layer2], activation_func=self.activation2,
                       dropout=self.dropout2, batch_norm=self.batch_norm2,
                       name="mlp2")(e2, training=training)
        return MultiHeadBilinearFusion(self.n_head, self.mlp_layer1[-1],
                                       self.mlp_layer2[-1], name="fusion")(o1, o2)


class FinalMLP(BaseRanker):

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_score_net(self, train_data):
        mc = self.config["model"]
        specs = make_field_specs(self.fields, train_data)
        f1 = mc.get("fields1") or (train_data.user_feat.fields
                                   if train_data.user_feat is not None else [self.fuid])
        f2 = mc.get("fields2") or (train_data.item_feat.fields
                                   if train_data.item_feat is not None else [self.fiid])
        s1 = make_field_specs(set(f1) & set(self.fields), train_data)
        s2 = make_field_specs(set(f2) & set(self.fields), train_data)
        return FinalMLPNet(specs, s1, s2, self.embed_dim,
                           tuple(mc["mlp_layer1"]), tuple(mc["mlp_layer2"]),
                           mc["activation1"], mc["activation2"],
                           mc["dropout1"], mc["dropout2"],
                           mc.get("batch_norm1", False), mc.get("batch_norm2", False),
                           tuple(mc["fs_mlp_layer"]), mc["n_head"],
                           mc.get("feature_selection", True))

    def _get_loss_func(self):
        return BCEWithLogitLoss()
