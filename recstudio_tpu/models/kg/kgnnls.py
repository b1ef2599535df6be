"""KGNNLS: KGCN + label-smoothness regularization.

Reference: recstudio/model/kg/kgnnls.py — KGCN scoring plus a label-propagation
term: known user-item labels propagate over the sampled KG neighborhood with
the same user-personalized relation weights, the target item held out; the
propagated label is trained toward the true label. The reference's hash-map
label lookup becomes a sorted-key searchsorted membership test (device-side,
static shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...data.dataset import TripletDataset
from ..loss_func import BCEWithLogitLoss
from .kgcn import KGCN


class KGNNLS(KGCN):

    def __init__(self, config, **kwargs):
        super().__init__(config, **kwargs)
        self.ls_weight = config["model"]["ls_weight"]

    def _build_adj(self, train_data):
        super()._build_adj(train_data)
        # positive (user, entity) keys, sorted for membership search
        sub = train_data.inter_feat_subset
        users = np.asarray(train_data.inter_feat.get_col(train_data.fuid))[sub].astype(np.int64)
        items = np.asarray(train_data.inter_feat.get_col(train_data.fiid))[sub].astype(np.int64)
        ratings = np.asarray(train_data.inter_feat.get_col(train_data.frating))[sub]
        pos = ratings > 0
        self._offset = int(10 ** len(str(self.num_entities)))
        keys = np.unique(users[pos] * self._offset + items[pos])
        self._pos_keys = jnp.asarray(np.sort(keys))

    def _lookup_labels(self, uid, entities):
        """1.0 for known positives, 0.5 unknown (reference interaction table)."""
        keys = uid[:, None].astype(jnp.int64) * self._offset + entities.astype(jnp.int64)
        idx = jnp.searchsorted(self._pos_keys, keys.reshape(-1))
        idx = jnp.minimum(idx, self._pos_keys.shape[0] - 1)
        hit = self._pos_keys[idx] == keys.reshape(-1)
        return jnp.where(hit, 1.0, 0.5).reshape(keys.shape)

    def _ls_labels(self, params, batch):
        """Propagate labels over the sampled neighborhood; returns [B]."""
        uid, iid = batch[self.fuid], batch[self.fiid]
        ents, rels = self._hops(iid)
        u = self.net.apply({"params": params}, uid,
                           method=lambda m, x: m.user_embedding(x))
        d, K = self.embed_dim, self.n_neighbor
        holdout = ents[0]                                  # [B, 1] target item
        labels, resets = [], []
        for e in ents:
            lab = self._lookup_labels(uid, e)
            held = e != holdout                            # False at the target
            reset = (lab != 0.5) & held
            lab = jnp.where(held, lab, 0.5)
            labels.append(lab)
            resets.append(reset)
        resets = resets[:-1]
        rel_vecs = [self.net.apply({"params": params}, r,
                                   method=lambda m, x: m.rel_embedding(x))
                    for r in rels]
        for i in range(self.n_iter):
            nxt = []
            for hop in range(self.n_iter - i):
                B = labels[hop].shape[0]
                neigh_lab = labels[hop + 1].reshape(B, -1, K)
                rel = rel_vecs[hop].reshape(B, -1, K, d)
                w = jax.nn.softmax(jnp.mean(rel * u[:, None, None, :], -1), -1)
                agg = (w * neigh_lab).sum(-1)              # [B, m]
                agg = agg.reshape(labels[hop].shape)
                new = jnp.where(resets[hop] if hop < len(resets) else False,
                                labels[hop], agg)
                nxt.append(new)
            labels = nxt
        return labels[0].reshape(-1)

    def training_step(self, params, batch, rng, states):
        scores = self.score(params, batch, training=True, rng=rng)
        label = batch[self.frating]
        ls_pred = self._ls_labels(params, batch)
        return self.loss_fn(label, scores) \
            + self.ls_weight * self.loss_fn(label, ls_pred)
