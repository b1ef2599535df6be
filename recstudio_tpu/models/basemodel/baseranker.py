"""BaseRanker: CTR / feature-interaction models.

Functional re-design of the reference (recstudio/model/basemodel/
baseranker.py:9-271). Rankers score one (user, item, context) interaction
pointwise; negatives come from the dataset (true negatives via binarized
ratings, or dataset-side uniform sampling), and evaluation is per-interaction
(``fmeval``): per-sample logloss/mse/mae/accuracy plus globally-gathered AUC
(reference :179-182,231-245 — here the epoch's scores/labels stay on device
and AUC is one weighted Mann-Whitney kernel).

Each concrete model supplies a flax score net via ``_get_score_net`` whose
``__call__(batch, training)`` returns logits ``[B]``; with a cascaded
retriever, ``topk`` reranks the retriever's candidates (two-stage, :141-154).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ... import eval as eval_mod
from ..loss_func import BCEWithLogitLoss
from .recommender import Recommender, batch_to_device


class BaseRanker(Recommender):

    def _set_data_field(self, data):
        # all declared fields participate as features (reference baseranker.py:52-60)
        if self.retriever is not None:
            # two-stage mode: candidates are re-scored at eval time, where only
            # user/item entity features exist (no interaction context like
            # timestamps), so restrict features to id + entity fields
            ratings = data.frating if isinstance(data.frating, list) else [data.frating]
            fields = {data.fuid, data.fiid, *ratings}
            if data.user_feat is not None:
                fields |= set(data.user_feat.fields)
            if data.item_feat is not None:
                fields |= set(data.item_feat.fields)
            data.use_field = fields & set(data.field2type.keys())
        else:
            data.use_field = set(data.field2type.keys())

    def _get_retriever(self, train_data):
        return None

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        self.rating_threshold = train_data.config.get("binarized_rating_thres")
        if self.retriever is None:
            self.retriever = self._get_retriever(train_data)
        if self.retriever is None:
            self.logger.info("no retriever attached: topk metrics unsupported, "
                             "using pointwise evaluation")
        else:
            # cascaded retriever (reference baseranker.py:89-99): it serves as
            # the negative sampler and the stage-1 candidate generator. Its
            # parameters live in ``states`` (not ``params``), mirroring the
            # reference's detached sampling probs (baseretriever.py:362-364):
            # the ranker loss never backprops into the retriever.
            if self.retriever.params is None:
                raise ValueError(
                    "attached retriever must be fitted (or at least "
                    "initialized via fit) before the ranker")
            self.states["retriever"] = {
                "params": self.retriever.params,
                "states": dict(self.retriever.states),
            }
        self.net = self._get_score_net(train_data)

    def _device_epoch_refresh_fn(self):
        """Jit-safe stage-1 refresh for cascaded rankers: the retriever's
        params live in ``states`` (never trained here), so its catalog
        re-encode + sampler re-index are pure functions of the states pytree
        and can run inside the block-fit jit."""
        if self.retriever is None:
            return None
        from ...ann.sampler import RetrieverSampler
        if isinstance(getattr(self.retriever, "sampler", None), RetrieverSampler):
            return None
        stateful = self.retriever._sampler_is_stateful()

        def refresh(params, states, rng):
            retr = states["retriever"]
            rs = dict(retr["states"])
            item_vector = self.retriever._item_vectors(retr["params"],
                                                       retr["states"])
            rs["item_vector"] = item_vector
            if stateful:
                sampler_state = self.retriever.sampler.update(rng, item_vector)
                if sampler_state != ():
                    rs["sampler"] = sampler_state
            new = dict(states)
            new["retriever"] = {"params": retr["params"], "states": rs}
            return new

        return refresh

    def _epoch_refresh(self, nepoch: int) -> None:
        if self.retriever is None:
            return
        # refresh the retriever's item-vector cache (and stateful sampler
        # index) so sampling/two-stage topk see current catalog encodings
        # (reference recommender.py:561-570 applied to the cascaded stage)
        rp = self.states["retriever"]["params"]
        if not hasattr(self, "_retr_item_vec_fn"):
            self._retr_item_vec_fn = jax.jit(self.retriever._compute_item_vector)
        item_vector = self._retr_item_vec_fn(rp)
        rs = dict(self.states["retriever"]["states"])
        rs["item_vector"] = item_vector
        if self.retriever._sampler_is_stateful():
            sampler_state = self.retriever.sampler.update(
                self.next_rng(), item_vector)
            if sampler_state != ():
                rs["sampler"] = sampler_state
        self.states["retriever"] = {"params": rp, "states": rs}

    # -- hooks ------------------------------------------------------------
    def _get_score_net(self, train_data):
        raise NotImplementedError

    def _get_loss_func(self):
        return BCEWithLogitLoss()

    # -- pure functions ----------------------------------------------------
    def _init_variables(self, batch):
        # collect fused-token-table layouts while the init trace runs (see
        # ctr._PROBE_DISCOVERY) — feeds the row-sparse optimizer gate below
        from ..module import ctr
        prev = ctr._PROBE_DISCOVERY
        prev_packed = ctr._PACKED_MOMENTS
        ctr._PROBE_DISCOVERY = {}
        # declare fused tables packed ([N, 3D] params|mu|nu) when the config
        # qualifies for the row-sparse optimizer; runtime-only disqualifiers
        # discovered later are handled by _prepare_sparse_state (unpack)
        ctr._PACKED_MOMENTS = self._ctr_sparse_config_ok()
        try:
            variables = self.net.init(
                {"params": self.next_rng(), "dropout": self.next_rng()},
                batch, training=False)
        finally:
            self._emb_probe_meta = dict(ctr._PROBE_DISCOVERY)
            ctr._PROBE_DISCOVERY = prev
            ctr._PACKED_MOMENTS = prev_packed
        return variables

    # ------------------------------------------------------------------
    # row-sparse embedding engine for CTR rankers: with the fused token
    # table (models/module/ctr.py), dense Adam reads+writes params AND both
    # moments for every one of the table's N rows each step — 5+ full [N, D]
    # HBM round-trips; at real criteo vocabularies (tens of millions of
    # rows) that traffic IS the step time. When ``learner: sparse_adam`` and
    # the gates below hold, the step differentiates a zero PROBE added to
    # the gathered rows instead of the table itself (so no dense [N, D]
    # cotangent ever exists) and applies fused_table_lazy_adam
    # (models/optim.py): O(batch) row traffic, identical trajectory.
    # Mirrors baseretriever.py's two-tower ``_sparse_grad_step``.
    # ------------------------------------------------------------------
    def _ctr_sparse_config_ok(self) -> bool:
        """Config-derivable half of the row-sparse gate, known BEFORE
        net.init — used to decide the packed [N, 3D] table declaration.
        Note the mesh exclusion: under ``train.mesh`` the table is GSPMD
        row-sharded and updated densely — a row-sparse scatter there would
        need per-shard a2a routing of candidate rows (future work), and at
        mesh scale the dense update amortizes over dp anyway."""
        tc = self.config["train"]
        return (
            str(tc.get("sparse_rows", "auto")).lower() != "false"
            and str(tc.get("learner", "adam")).lower() == "sparse_adam"
            and not tc.get("weight_decay")
            and not tc.get("grad_clip_norm")
            and not tc.get("scheduler")
            and self.retriever is None
            and not tc.get("mesh")
        )

    def _ctr_sparse_enabled(self) -> bool:
        if hasattr(self, "_ctr_sparse_flag"):
            return self._ctr_sparse_flag
        meta = getattr(self, "_emb_probe_meta", None)
        ok = (
            bool(meta)
            and self._ctr_sparse_config_ok()
            and getattr(self, "_mesh", None) is None
            and len(getattr(self, "optimizers", [None])) == 1
        )
        if ok:
            for m in meta.values():
                node = self.params
                try:
                    for k in m["param_path"]:
                        node = node[k]
                except (KeyError, TypeError):
                    ok = False
                    break
                # the leaf must be PACKED (declared at init when the config
                # qualified): [N, 3D] = params | mu | nu
                if getattr(node, "shape", None) != (sum(m["sizes"]),
                                                    3 * m["embed_dim"]):
                    ok = False
                    break
        self._ctr_sparse_flag = bool(ok)
        if ok:
            self.logger.info(
                "row-sparse fused-table updates engaged: "
                + ", ".join(f"{k}[{sum(m['sizes'])}x{m['embed_dim']}]"
                            for k, m in meta.items()))
        return self._ctr_sparse_flag

    def _prepare_sparse_state(self) -> None:
        """Finalize the packed-table state after optimizer init.

        Fused-table leaves were DECLARED [N, 3D] = (params | mu | nu) at
        net.init when the config qualified (ctr.py ``_PACKED_MOMENTS``), so
        the per-step update is ONE row gather + ONE row scatter: TPU
        scatter cost is per-row and width-independent below 128 lanes
        (measured 2026-08-20, donated buffers: a 74k-row scatter costs
        8.8 ms at D=10 and 10.6 ms at D=30, while THREE D=10 scatters cost
        24 ms) — packing removes ~2/3 of the term by which sparse_adam
        lost to dense Adam in BENCH_r04. Here we (a) re-zero the moment
        columns (init_parameters may have re-randomized the whole leaf),
        (b) drop the optimizer's dense [N, 3D] moment mirrors for those
        leaves (the packed buffer carries the moments), and (c) if a leaf
        is packed but a runtime-only disqualifier turned the gate OFF
        (e.g. a second optimizer), UNPACK it — a packed leaf on the dense
        path would silently stop training (its reads are stop_gradient)."""
        meta = getattr(self, "_emb_probe_meta", None)
        if not meta:
            return
        from ..optim import unpack_table_params

        def replace(tree, path, fn):
            new = dict(tree)
            if len(path) == 1:
                new[path[0]] = fn(tree[path[0]])
            else:
                new[path[0]] = replace(tree[path[0]], path[1:], fn)
            return new

        def get(tree, path):
            for k in path:
                tree = tree[k]
            return tree

        enabled = self._ctr_sparse_enabled()
        # fresh buffer per placeholder: donated scan carries reject the same
        # buffer appearing twice, and 1-element zeros (unlike 0-size ones)
        # are guaranteed distinct allocations
        placeholder = lambda _: jnp.zeros((1,), jnp.float32) + 0.0
        rebuilt = False
        for m in meta.values():
            path = m["param_path"]
            leaf = get(self.params, path)
            is_packed = leaf.shape[-1] == 3 * m["embed_dim"]
            if enabled and is_packed:
                d = m["embed_dim"]
                self.params = replace(
                    self.params, path,
                    lambda p, d=d: jnp.concatenate(
                        [p[:, :d], jnp.zeros((p.shape[0], 2 * d), p.dtype)],
                        axis=-1))
                (inner,) = self.opt_states[0]
                inner = inner._replace(
                    mu=replace(inner.mu, path, placeholder),
                    nu=replace(inner.nu, path, placeholder))
                self.opt_states[0] = (inner,)
            elif is_packed:
                self.params = replace(self.params, path, unpack_table_params)
                rebuilt = True
        if rebuilt:
            self.logger.warning(
                "fused tables were declared packed but the row-sparse gate "
                "is off at runtime — unpacked to keep the dense path exact")
            self.opt_states = [
                o["optimizer"].init(self.params) if o.get("optimizer")
                else None for o in self.optimizers]

    def _grad_step(self, optimizer, params, opt_state, batch, rng, states):
        if self._ctr_sparse_enabled():
            return self._ctr_sparse_grad_step(params, opt_state, batch, rng,
                                              states)
        return super()._grad_step(optimizer, params, opt_state, batch, rng,
                                  states)

    def _ctr_sparse_grad_step(self, params, opt_state, batch, rng, states):
        from ..init import zero_pad_rows_in_grads
        from ..optim import (LazyAdamState, fused_table_lazy_adam_packed,
                             lazy_update_leaf)
        lr = float(self.config["train"].get("learning_rate", 1e-3))
        meta = self._emb_probe_meta
        rating0 = (self.frating[0] if isinstance(self.frating, list)
                   else self.frating)
        B = batch[rating0].shape[0]
        probes = {k: jnp.zeros((B, len(m["fields"]), m["embed_dim"]),
                               jnp.float32) for k, m in meta.items()}
        table_paths = {m["param_path"]: (k, m) for k, m in meta.items()}

        # Differentiate ONLY the dense leaves: the packed [N, 3D] tables are
        # reinserted via closure (their reads are stop_gradient'd in probe
        # mode), because jax.grad INSTANTIATES the returned zero cotangent —
        # a concrete [N, 3D] zeros buffer per table, 2.9 GB at 22M rows,
        # which OOMed the hugevocab leg. The real per-lookup grads ride the
        # zero probes.
        def replace(tree, path, leaf):
            new = dict(tree)
            if len(path) == 1:
                new[path[0]] = leaf
            else:
                new[path[0]] = replace(tree[path[0]], path[1:], leaf)
            return new

        tables = {}
        params_nd = params
        for names in table_paths:
            node = params
            for k in names:
                node = node[k]
            tables[names] = node
            params_nd = replace(params_nd, names,
                                jnp.zeros((1, 1), jnp.float32))

        def loss_fn(ps_nd, pr):
            ps = ps_nd
            for names, leaf in tables.items():
                ps = replace(ps, names, leaf)
            b2 = dict(batch)
            b2["__emb_probes__"] = pr
            return self._loss_and_aux(ps, b2, rng, states)

        (loss, _), (grads, g_probes) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params_nd, probes)
        grads = zero_pad_rows_in_grads(grads)

        (inner,) = opt_state
        count = inner.count + 1

        def upd(path, p, g, mu, nu):
            names = tuple(str(getattr(x, "key", x)) for x in path)
            if names in table_paths:
                # p is the packed [N, 3D] buffer (_prepare_sparse_state);
                # mu/nu and g are tiny placeholders — the real per-lookup
                # grads ride g_probes
                key, m = table_paths[names]
                ids2 = jnp.stack(
                    [batch[f] + off
                     for f, off in zip(m["fields"], m["offsets"])], axis=-1)
                packed2 = fused_table_lazy_adam_packed(
                    m["sizes"], p, ids2, g_probes[key], count, lr)
                return packed2, mu, nu
            # dense leaves (MLP/interaction weights): same lazy-adam math
            # the dense path's optax lazy_adam applies
            step, mu2, nu2 = lazy_update_leaf(g, mu, nu, count, lr)
            return p + step, mu2, nu2

        flat = jax.tree_util.tree_map_with_path(
            upd, params, grads, inner.mu, inner.nu)
        is3 = lambda x: isinstance(x, tuple) and len(x) == 3 \
            and not isinstance(x[0], tuple)
        params = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=is3)
        mu = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=is3)
        nu = jax.tree_util.tree_map(lambda t: t[2], flat, is_leaf=is3)
        new_state = (LazyAdamState(count=count, mu=mu, nu=nu),)
        return params, new_state, loss

    def score(self, params, batch, training: bool = False, rng=None,
              net_state=None):
        rngs = {"dropout": rng} if (rng is not None and training) else None
        return self.net.apply({"params": params, **(net_state or {})}, batch,
                              training=training, rngs=rngs)

    def predict(self, batch: Dict[str, np.ndarray], with_sigmoid: bool = True
                ) -> np.ndarray:
        """Serve CTR scores for a feature batch (reference exposes only the
        torch forward; this is the jitted inference entry the serving layer
        uses). Returns probabilities (``with_sigmoid=True``) or raw logits."""
        dev = batch_to_device(batch)
        if not hasattr(self, "_predict_jit"):
            self._predict_jit = jax.jit(self.score)   # one trace per shape
        logits = self._predict_jit(self.params, dev,
                                   net_state=self.states.get("net"))
        if with_sigmoid:
            logits = jax.nn.sigmoid(logits)
        return np.asarray(logits)

    def _calibration_forward(self, params, batch, net_state):
        import flax
        _, upd = self.net.apply({"params": params, **net_state}, batch,
                                training=False, mutable=["batch_stats"])
        return {**net_state, **flax.core.unfreeze(upd)}

    def forward(self, params, batch, rng, states, training: bool = True):
        if self.retriever is not None and training:
            # positives-only dataset: the retriever samples negatives and the
            # ranker scores them pairwise (reference baseranker.py:89-99)
            assert self.neg_count, "`negative_count` required with a retriever"
            assert not isinstance(self.frating, list), \
                "multitask + retriever sampling unsupported"
            rng_s, rng_d = jax.random.split(rng)
            net_state = states.get("net")
            pos_score = self.score(params, batch, training=training, rng=rng_d,
                                   net_state=net_state)
            retr = states["retriever"]
            log_pos_prob, neg_ids, log_neg_prob = self.retriever.sampling(
                retr["params"], batch, rng_s, retr["states"], self.neg_count,
                method=self.config["train"].get("sampling_method", "none"),
                excluding_hist=self.config["train"].get("excluding_hist", False))
            neg_batch = self._multi_item_batch(batch, neg_ids)
            neg_score = self.score(params, neg_batch, training=training, rng=rng_d,
                                   net_state=net_state).reshape(-1, self.neg_count)
            return {"pos_score": pos_score,
                    "log_pos_prob": log_pos_prob,
                    "neg_score": neg_score,
                    "log_neg_prob": log_neg_prob,
                    "label": batch[self.frating]}
        scores = self.score(params, batch, training=training, rng=rng,
                            net_state=states.get("net"))
        if isinstance(self.frating, list):  # multitask: one head per rating
            return {r: {"pos_score": scores[r], "label": batch[r]}
                    for r in self.frating}
        return {"pos_score": scores, "label": batch[self.frating]}

    def training_step(self, params, batch, rng, states):
        out = self.forward(params, batch, rng, states)
        if isinstance(self.frating, list):
            weights = self.config["train"].get("weights") or [1.0] * len(self.frating)
            w = jax.nn.softmax(jnp.asarray(weights, jnp.float32))
            return sum(w[i] * self.loss_fn(out[r]["label"], out[r]["pos_score"])
                       for i, r in enumerate(self.frating))
        if "neg_score" in out:  # pairwise (retriever-sampled) path
            return self.loss_fn(**out)
        return self.loss_fn(out["label"], out["pos_score"])

    # -- evaluation ---------------------------------------------------------
    def _make_eval_step(self, metric_names, cutoffs):
        rank_m = eval_mod.get_rank_metrics(metric_names)
        if self.retriever is not None and rank_m:
            return self._make_rank_eval_step(rank_m, cutoffs)
        pred_m = eval_mod.get_pred_metrics(metric_names)
        global_names = {m for m, _ in eval_mod.get_global_metrics(metric_names)}
        thres = self.config["eval"].get("binarized_prob_thres", 0.5)

        ratings = self.frating if isinstance(self.frating, list) else [self.frating]
        multitask = isinstance(self.frating, list)

        @jax.jit
        def step(params, batch, states):
            bs = batch["_size"]
            B = batch[ratings[0]].shape[0]
            valid = (jnp.arange(B) < bs).astype(jnp.float32)
            scores_all = self.score(params, batch, training=False,
                                    net_state=states.get("net"))
            out = {}
            glob = {} if global_names else None
            for r in ratings:
                scores = scores_all[r] if multitask else scores_all
                label = batch[r]
                prefix = f"{r}_" if multitask else ""
                for name, fn in pred_m:
                    if name in global_names:
                        continue
                    if name == "logloss":
                        per = fn(scores, label)
                    elif name == "accuracy":
                        per = fn(jax.nn.sigmoid(scores), label, thres)
                    elif name in ("mse", "mae"):
                        per = fn(jax.nn.sigmoid(scores), label)
                    else:  # binary precision/recall/f1 over predictions: later
                        continue
                    out[prefix + name] = (per * valid).sum()
                if global_names:
                    glob[r] = {"score": scores, "label": label, "weight": valid}
            return out, bs.astype(jnp.float32), glob
        return step

    def _make_rank_eval_step(self, rank_m, cutoffs):
        """Two-stage topk evaluation: retrieve candidates, rerank, score rank
        metrics exactly like a retriever (reference baseranker.py:204-218)."""
        topk = self.config["eval"]["topk"]

        @jax.jit
        def step(params, batch, states):
            bs = batch["_size"]
            B = batch[self.frating].shape[0] if batch[self.frating].ndim else 1
            valid = (jnp.arange(B) < bs).astype(jnp.float32)
            _, topk_items = self.topk(params, batch, topk,
                                      user_hist=batch.get("user_hist"),
                                      states=states)
            if batch[self.fiid].ndim > 1:
                target_ids = batch[self.fiid]
                pos_rating = batch[self.frating]
            else:
                target_ids = batch[self.fiid][:, None]
                pos_rating = batch[self.frating][:, None]
            label = jnp.any(
                (topk_items[:, :, None] == target_ids[:, None, :])
                & (target_ids[:, None, :] > 0), axis=-1)
            out = {}
            for cutoff in cutoffs:
                for name, fn in rank_m:
                    per_sample = fn(label, pos_rating, cutoff)
                    out[f"{name}@{cutoff}"] = (per_sample * valid).sum()
            return out, bs.astype(jnp.float32), None
        return step

    def _global_metrics(self, metric_names, globs) -> Dict[str, float]:
        global_m = eval_mod.get_global_metrics(metric_names)
        if not global_m or globs is None:
            return {}
        multitask = isinstance(self.frating, list)
        out = {}
        for r, g in globs.items():
            scores = g["score"].reshape(-1)
            labels = g["label"].reshape(-1)
            weights = g["weight"].reshape(-1)
            prefix = f"{r}_" if multitask else ""
            for name, fn in global_m:
                out[prefix + name] = float(fn(scores, labels, weights))
        return out

    # -- two-stage retrieval (rerank the retriever's candidates) -----------
    def topk(self, params, batch, k: int, user_hist=None, states=None):
        if self.retriever is None:
            raise NotImplementedError("topk requires a cascaded retriever")
        states = states if states is not None else self.states
        retr = states["retriever"]
        retr_k = self.retriever.config["eval"]["topk"]
        assert k <= retr_k, "ranker topk must be <= the retriever's eval.topk"
        score_re, topk_items = self.retriever.topk(
            retr["params"], batch, retr_k, user_hist, states=retr["states"])
        multi = self._multi_item_batch(batch, topk_items)
        scores = self.score(params, multi, net_state=states.get("net")) \
            .reshape(topk_items.shape[0], -1)
        top_scores, idx = jax.lax.top_k(scores, k)
        return top_scores, jnp.take_along_axis(topk_items, idx, axis=-1)

    def _multi_item_batch(self, batch, item_ids):
        num_item = item_ids.shape[-1]
        flat_ids = item_ids.reshape(-1)
        out = {}
        item_field_values = {self.fiid: flat_ids}
        if self.item_feat is not None:
            for f in self.item_feat.fields:
                if f in self.fields and f != self.fiid:
                    out_f = jnp.asarray(self.item_feat.get_col(f))[flat_ids]
                    item_field_values[f] = out_f
        for k, v in batch.items():
            if k in item_field_values:
                out[k] = item_field_values[k]
            elif hasattr(v, "ndim") and v.ndim >= 1:
                out[k] = jnp.repeat(v, num_item, axis=0) if v.shape[0] == item_ids.shape[0] \
                    else v
            else:
                out[k] = v
        return out
