"""NGCF: neural graph collaborative filtering.

Reference: recstudio/model/graph/ngcf.py — Bi-aggregation per layer
(LeakyReLU(W1(self + neigh)) + LeakyReLU(W2(self * neigh))), left-normalized
messages, L2-normalized layer outputs, concatenated readout, message/node
dropout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...data.dataset import TripletDataset
from ..loss_func import l2_reg_loss_fn
from .base import BaseGraphRetriever


class NGCF(BaseGraphRetriever):

    def _build_graph(self, train_data):
        super()._build_graph(train_data)
        import numpy as np
        # left normalization D^-1 A
        src = np.asarray(self._edges[0])
        deg = np.bincount(src, minlength=self._num_nodes).astype(np.float32)
        self._left_norm = jnp.asarray(np.where(deg > 0, 1.0 / deg, 0.0))

    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _init_variables(self, batch):
        variables = super()._init_variables(batch)
        params = variables["params"]
        layers = self.config["model"]["layer_size"]
        rng = self.next_rng()
        for i, (d_in, d_out) in enumerate(zip(layers[:-1], layers[1:])):
            k1, k2 = jax.random.split(jax.random.fold_in(rng, i))
            std = (2.0 / (d_in + d_out)) ** 0.5
            params[f"layer_{i}"] = {
                "W1": {"kernel": std * jax.random.normal(k1, (d_in, d_out)),
                       "bias": jnp.zeros(d_out)},
                "W2": {"kernel": std * jax.random.normal(k2, (d_in, d_out)),
                       "bias": jnp.zeros(d_out)},
            }
        return variables

    def _left_conv(self, emb):
        src, dst = self._edges
        msg = emb[src] * self._left_norm[src][:, None]
        return jax.ops.segment_sum(msg, dst, num_segments=self._num_nodes)

    def propagate(self, params, rng=None, training: bool = False):
        mc = self.config["model"]
        emb = jnp.concatenate([params["user_embedding"], params["item_embedding"]])
        outs = [emb]
        x = emb
        n_layers = len(mc["layer_size"]) - 1
        for i in range(n_layers):
            neigh = self._left_conv(x)
            W1, W2 = params[f"layer_{i}"]["W1"], params[f"layer_{i}"]["W2"]
            h = jax.nn.leaky_relu((x + neigh) @ W1["kernel"] + W1["bias"]) \
                + jax.nn.leaky_relu((x * neigh) @ W2["kernel"] + W2["bias"])
            if training and rng is not None and mc.get("mess_dropout"):
                p = mc["mess_dropout"][i]
                keep = jax.random.bernoulli(jax.random.fold_in(rng, i), 1 - p, h.shape)
                h = jnp.where(keep, h / (1 - p), 0.0)
            x = h
            outs.append(x * jax.lax.rsqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12))
        out = jnp.concatenate(outs, axis=-1)
        return out[: self.num_users], out[self.num_users:]

    def training_step(self, params, batch, rng, states):
        rng_drop, rng_samp = jax.random.split(rng)
        user_all, item_all = self.propagate(params, rng_drop, training=True)
        query = user_all[batch[self.fuid]]
        pos_vec = item_all[batch[self.fiid]]
        pos_score = self.score_func(query, pos_vec)
        log_pos_prob, neg_ids, log_neg_prob = self.sampler(
            states.get("sampler", ()), rng_samp, jax.lax.stop_gradient(query),
            self.neg_count, pos_items=batch[self.fiid])
        neg_score = self.score_func(query, item_all[neg_ids])
        loss = self.loss_fn(batch[self.frating], pos_score, log_pos_prob,
                            neg_score, log_neg_prob)
        reg = l2_reg_loss_fn(params["user_embedding"][batch[self.fuid]],
                             params["item_embedding"][batch[self.fiid]],
                             params["item_embedding"][neg_ids.reshape(-1)])
        return loss + self.config["model"]["l2_reg_weight"] * reg
