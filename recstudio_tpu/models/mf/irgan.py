"""IRGAN: adversarial retrieval (discriminator vs generator).

Reference: recstudio/model/mf/irgan.py — MF discriminator trained on negatives
sampled from the generator's tempered softmax ('brute' retriever sampling),
and a policy-gradient generator rewarded by the discriminator, alternating on
an epoch cycle. Functional re-design: one param tree holds both players;
each phase has its own masked optimizer and jitted step.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ...data.advance_dataset import ALSDataset
from ..basemodel import BaseRetriever
from ..basemodel.recommender import batch_to_device
from ..init import zero_pad_rows_in_grads
from ..scorer import InnerProductScorer


class IRGAN(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return ALSDataset

    def _init_model(self, train_data, drop_unused_field: bool = True):
        from ..basemodel.recommender import Recommender
        Recommender._init_model(self, train_data, drop_unused_field)
        self.num_users = train_data.num_users
        self.num_items = train_data.num_items
        self.query_fields = {self.fuid}
        self.item_fields = {self.fiid}
        self._item_feat_arrays = None
        self.net = None
        self.score_func = InnerProductScorer()
        self.sampler = None

    def _get_loss_func(self):
        return None  # custom masked BCE inside the dis step

    def _init_variables(self, batch):
        rng = self.next_rng()
        keys = jax.random.split(rng, 4)
        d = self.embed_dim

        def emb(k, n):
            return (0.02 * jax.random.normal(k, (n, d))).at[0].set(0.0)
        return {"params": {
            "dis_user_embedding": emb(keys[0], self.num_users),
            "dis_item_embedding": emb(keys[1], self.num_items),
            "gen_user_embedding": emb(keys[2], self.num_users),
            "gen_item_embedding": emb(keys[3], self.num_items),
        }}

    def _get_optimizers(self):
        tc = self.config["train"]

        def masked_adam(lr, wd, prefix):
            def mask(params):
                return {k: k.startswith(prefix) for k in params}
            base = optax.adamw(lr, weight_decay=wd) if wd else optax.adam(lr)
            return optax.masked(base, mask)
        return [
            {"optimizer": masked_adam(float(tc["learning_rate_dis"]),
                                      float(tc.get("weight_decay_dis") or 0.0), "dis_")},
            {"optimizer": masked_adam(float(tc["learning_rate_gen"]),
                                      float(tc.get("weight_decay_gen") or 0.0), "gen_")},
        ]

    def _supports_scan_epoch(self, train_data):
        return False

    def _phase(self, nepoch: int) -> int:
        tc = self.config["train"]
        cycle = tc["every_n_epoch_gen"] + tc["every_n_epoch_dis"]
        return 0 if (nepoch % cycle) < tc["every_n_epoch_dis"] else 1

    def current_epoch_optimizers(self, nepoch):
        return [self._phase(nepoch)]

    # -- generator sampling (tempered softmax with importance mixing) -------
    def _gen_sample(self, params, rng, batch, num_neg, t):
        mc = self.config["model"]
        query = params["gen_user_embedding"][batch[self.fuid]]
        item_vec = params["gen_item_embedding"][1:]
        pos_items = batch[self.fiid]                      # [B, L]
        logits = self.score_func(query, item_vec) / t     # [B, N-1]
        prob = jax.nn.softmax(logits, axis=-1)
        prob = jnp.pad(prob, ((0, 0), (1, 0)))            # [B, N] with pad col
        lam = mc["sample_lambda"]
        num_pos = jnp.maximum((pos_items > 0).sum(-1, keepdims=True), 1)
        imp = prob * (1.0 - lam)
        add = jnp.zeros_like(imp).at[
            jnp.arange(imp.shape[0])[:, None], pos_items].add(lam / num_pos)
        imp = (imp + add).at[:, 0].set(0.0)
        draws = jax.random.categorical(
            rng, jnp.log(imp + 1e-12), axis=-1,
            shape=(num_neg * pos_items.shape[-1], imp.shape[0])).T  # [B, n*L]
        neg_prob = jnp.take_along_axis(prob, draws, axis=-1)
        weight = neg_prob / jnp.take_along_axis(imp + 1e-12, draws, axis=-1)
        return jax.lax.stop_gradient(weight), draws, neg_prob

    # -- phase steps ----------------------------------------------------
    def _dis_loss(self, params, batch, rng):
        tc, mc = self.config["train"], self.config["model"]
        query = params["dis_user_embedding"][batch[self.fuid]]
        pos_vec = params["dis_item_embedding"][batch[self.fiid]]
        pos_score = self.score_func(query, pos_vec)
        pos_score = jnp.where(batch[self.fiid] == 0, -jnp.inf, pos_score)
        _, neg_ids, _ = self._gen_sample(jax.lax.stop_gradient(params), rng,
                                         batch, self.neg_count, mc["T_dis"])
        neg_vec = params["dis_item_embedding"][neg_ids]
        neg_score = self.score_func(query, neg_vec)       # [B, n*L]
        neg_score = neg_score.reshape(*pos_score.shape, -1).mean(-1)
        valid = ~jnp.isinf(pos_score)
        per = -jax.nn.log_sigmoid(pos_score) + jax.nn.softplus(neg_score)
        return jnp.where(valid, per, 0.0).sum() / jnp.maximum(valid.sum(), 1)

    def _gen_loss(self, params, batch, rng):
        mc = self.config["model"]
        weight, neg_ids, neg_prob = self._gen_sample(
            params, rng, batch, 2 * self.neg_count, mc["T_gen"])
        # reward from the (frozen) discriminator
        d_query = jax.lax.stop_gradient(params["dis_user_embedding"])[batch[self.fuid]]
        d_items = jax.lax.stop_gradient(params["dis_item_embedding"])[neg_ids]
        reward = 2.0 * (jax.nn.sigmoid(self.score_func(d_query, d_items)) - 0.5) * weight
        return -jnp.sum(jnp.mean(jnp.log(neg_prob + 1e-12) * jax.lax.stop_gradient(reward),
                                 axis=1))

    def training_epoch(self, nepoch: int) -> float:
        phase = self._phase(nepoch)
        if not hasattr(self, "_phase_steps"):
            self._phase_steps = {}
        if phase not in self._phase_steps:
            opt = self.optimizers[phase]["optimizer"]
            loss_fn = self._dis_loss if phase == 0 else self._gen_loss

            @jax.jit
            def step(params, opt_state, batch, rng):
                loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
                grads = zero_pad_rows_in_grads(grads)
                updates, opt_state = opt.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss
            self._phase_steps[phase] = step
        step = self._phase_steps[phase]
        loader = self.trainloaders[0]
        total, nb = 0.0, 0
        for batch in loader:
            batch = batch_to_device(batch)
            self.params, self.opt_states[phase], loss = step(
                self.params, self.opt_states[phase], batch, self.next_rng())
            total += float(loss)
            nb += 1
        return total / max(nb, 1)

    # -- evaluation uses the generator (reference irgan.py:84-88) ----------
    def _compute_item_vector(self, params):
        return params["gen_item_embedding"][1:]

    def topk(self, params, batch, k, user_hist=None, states=None, return_query=False):
        states = states if states is not None else self.states
        item_vector = states.get("item_vector")
        if item_vector is None:
            item_vector = self._compute_item_vector(params)
        query = params["gen_user_embedding"][batch[self.fuid]]
        scores = self.score_func(query, item_vector)
        score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items
