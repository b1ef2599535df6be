"""BaseRetriever: the two-tower retrieval abstraction.

Functional re-design of the reference (recstudio/model/basemodel/
baseretriever.py:13-431). The module slots are identical — ``item_encoder`` /
``query_encoder`` / ``score_func`` / ``sampler`` / ``loss_fn``, injectable via
constructor kwargs for compositional model building — but forward/sampling/
topk are pure jit-safe functions over a params pytree:

- negative mining strategies ``none / sir / dns / toprand / top&rand / brute``
  (reference :248-369) implemented with static shapes (Gumbel-categorical for
  multinomial draws);
- full-catalog ``topk`` masks the user history **inside** the score matrix
  (exactly equivalent to the reference's `topk(k+len(hist))`-then-re-topk at
  :374-397, because at most |hist| candidates can be masked) and then runs a
  single ``lax.top_k`` / Pallas chunked MIPS;
- the per-epoch item-vector cache (+ model-based sampler refresh) lives in the
  ``states`` pytree (reference ``_update_item_vector`` :117-140).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import eval as eval_mod
from ...ann.sampler import (MaskedUniformSampler, RetrieverSampler, Sampler,
                            UniformSampler)
from ..init import init_parameters
from ..loss_func import BPRLoss, FullScoreLoss
from ..module import Embedding
from ..scorer import CosineScorer, InnerProductScorer
from .recommender import Recommender, batch_to_device


class TwoTowerNet(nn.Module):
    """Bundles the three parametric slots into one flax module tree."""
    item_encoder: Any
    query_encoder: Any
    score_func: Any

    def encode_query(self, query_feat, training: bool = False):
        return self.query_encoder(query_feat, training=training)

    def encode_item(self, item_feat, training: bool = False):
        return self.item_encoder(item_feat, training=training)

    def score(self, query, items):
        return self.score_func(query, items)

    def __call__(self, query_feat, item_feat, training: bool = False):
        q = self.encode_query(query_feat, training=training)
        v = self.encode_item(item_feat, training=training)
        return self.score(q, v)


class SharedItemTowerNet(nn.Module):
    """Two-tower net where the query encoder OWNS the item embedding table
    (sequence models: the same table embeds history items and scores targets,
    reference seq/sasrec.py:70-123). ``encode_item`` routes through the query
    encoder's ``item_encoder`` submodule so the parameters are truly shared."""
    query_encoder: Any
    score_func: Any

    def encode_query(self, query_feat, training: bool = False):
        return self.query_encoder(query_feat, training=training)

    def encode_item(self, item_feat, training: bool = False):
        return self.query_encoder.item_encoder(item_feat, training=training)

    def score(self, query, items):
        return self.score_func(query, items)

    def __call__(self, query_feat, item_feat, training: bool = False):
        q = self.encode_query(query_feat, training=training)
        v = self.encode_item(item_feat, training=training)
        return self.score(q, v)


class BaseRetriever(Recommender):
    def __init__(self, config: Dict = None, **kwargs):
        super().__init__(config, **kwargs)
        self.query_encoder = kwargs.get("query_encoder", None)
        self.item_encoder = kwargs.get("item_encoder", None)
        self.score_func = kwargs.get("scorer", None)
        self.sampler = kwargs.get("sampler", None)
        self.query_fields = None
        self.item_fields = None
        self.use_index = False  # faiss-style ANN replaced by exact on-device MIPS

    # ------------------------------------------------------------------
    # model assembly hooks (same contract as the reference)
    # ------------------------------------------------------------------
    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        raise NotImplementedError

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_sampler(self, train_data):
        """Build the sampler named by ``train.sampler`` (the reference
        documents the same choices in basemodel.yaml:55 but hardcodes
        UniformSampler per model — here the config is honored)."""
        from ...ann import sampler as S
        name = str(self.config["train"].get("sampler") or "uniform").lower()
        n = train_data.num_items
        k = int(self.config["train"].get("sampler_num_clusters", 32))
        if name in ("uniform", "none"):
            return UniformSampler(n)
        if name == "masked_uniform":
            return MaskedUniformSampler(n)
        if name == "pop":
            return S.PopularSamplerModel(train_data.item_freq)
        if name == "midx-uni":
            return S.MIDXSamplerUniform(n, k)
        if name == "midx-pop":
            return S.MIDXSamplerPop(train_data.item_freq, k)
        if name == "cluster-uni":
            return S.ClusterSamplerUniform(n, k)
        if name == "cluster-pop":
            return S.ClusterSamplerPop(train_data.item_freq, k)
        if name == "lsh":
            return S.LSHSampler(n, self.embed_dim,
                                n_bits=int(self.config["train"].get("lsh_bits", 4)),
                                n_table=int(self.config["train"].get("lsh_tables", 8)))
        raise ValueError(f"unknown train.sampler: {name}")

    def _get_loss_func(self):
        return BPRLoss()

    def _init_model(self, train_data, drop_unused_field: bool = True):
        super()._init_model(train_data, drop_unused_field)
        self.__dict__.pop("_sparse_rows_flag", None)  # re-gate on refit
        self.num_items = train_data.num_items
        self.num_users = train_data.num_users
        if self.item_encoder is None:
            self.item_encoder = self._get_item_encoder(train_data)
        if self.query_encoder is None:
            self.query_encoder = self._get_query_encoder(train_data)
        if self.score_func is None:
            self.score_func = self._get_score_func()
        if self.sampler is None:
            self.sampler = self._get_sampler(train_data)
        if getattr(self.query_encoder, "item_encoder", None) is self.item_encoder \
                and self.item_encoder is not None:
            self.net = SharedItemTowerNet(self.query_encoder, self.score_func)
        else:
            self.net = TwoTowerNet(self.item_encoder, self.query_encoder, self.score_func)
        # query-side fields: user feats + in_-prefixed item fields (+ seqlen)
        # (reference baseretriever.py:56-60)
        from ...data.dataset import SeqDataset, UserDataset
        if train_data.user_feat is not None:
            self.query_fields = set(train_data.user_feat.fields).intersection(self.fields)
        else:
            self.query_fields = {self.fuid} & self.fields
        if isinstance(train_data, (SeqDataset, UserDataset)):
            self.query_fields |= {"in_" + f for f in self.item_fields}
            if isinstance(train_data, SeqDataset):
                self.query_fields.add("seqlen")
        # device-resident item feature table for multi-field item encoders
        if len(self.item_fields) > 1 and train_data.item_feat is not None:
            self._item_feat_arrays = {
                f: jnp.asarray(train_data.item_feat.get_col(f))
                for f in self.item_fields}
        else:
            self._item_feat_arrays = None

    # ------------------------------------------------------------------
    # feature extraction (reference baseretriever.py:70-101)
    # ------------------------------------------------------------------
    def _get_item_feat(self, data):
        if isinstance(data, dict):  # batch
            if len(self.item_fields) == 1:
                return data[self.fiid]
            return {f: v for f, v in data.items() if f in self.item_fields}
        # ids array
        if len(self.item_fields) == 1:
            return data
        return {f: arr[data] for f, arr in self._item_feat_arrays.items()}

    def _get_query_feat(self, data):
        if isinstance(data, dict):
            if len(self.query_fields) == 1:
                return data[next(iter(self.query_fields))]
            return {f: v for f, v in data.items() if f in self.query_fields}
        if len(self.query_fields) == 1:
            return data
        raise ValueError("cannot build a multi-field query feat from a raw array")

    # ------------------------------------------------------------------
    # pure-function applications
    # ------------------------------------------------------------------
    def _mixed_precision(self) -> bool:
        return str(self.config["train"].get("precision", "fp32")).lower() \
            in ("bf16", "bfloat16")

    def _apply(self, params, method: str, *args, rng=None, training: bool = False,
               net_state=None):
        rngs = {"dropout": rng} if (rng is not None and training) else None
        # `train.precision: bf16` = true mixed precision through the towers:
        # master params stay f32 (optimizer side), the forward runs with
        # bf16 params + activations (profiled SASRec is activation-bandwidth
        # bound — elementwise/layernorm traffic, not MXU flops), outputs
        # return to f32 for scores/losses. Grads flow through the casts.
        mp = self._mixed_precision() and method in ("encode_query", "encode_item")
        if mp:
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        variables = {"params": params, **(net_state or {})}
        out = self.net.apply(variables, *args, training=training,
                             method=getattr(self.net, method), rngs=rngs) \
            if method in ("encode_query", "encode_item") else \
            self.net.apply(variables, *args, method=getattr(self.net, method))
        if mp:
            out = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.bfloat16) else x, out)
        return out

    def _calibration_forward(self, params, batch, net_state):
        """Mutable pass through both towers (batch-norm recalibration)."""
        import flax

        def merge(ns, upd):
            upd = flax.core.unfreeze(upd)
            out = dict(ns)
            for coll, tree in upd.items():
                base = dict(out.get(coll, {}))
                base.update(tree)
                out[coll] = base
            return out

        variables = {"params": params, **net_state}
        _, upd = self.net.apply(variables, self._get_query_feat(batch),
                                training=False, method=self.net.encode_query,
                                mutable=["batch_stats"])
        net_state = merge(net_state, upd)
        variables = {"params": params, **net_state}
        _, upd = self.net.apply(variables, self._get_item_feat(batch),
                                training=False, method=self.net.encode_item,
                                mutable=["batch_stats"])
        return merge(net_state, upd)

    def _init_variables(self, batch):
        q = self._get_query_feat(batch)
        i = self._get_item_feat(batch)
        return self.net.init({"params": self.next_rng(), "dropout": self.next_rng()},
                             q, i, training=False)

    def _compute_item_vector(self, params, net_state=None) -> jax.Array:
        """Encode the full catalog (excluding [PAD] row)."""
        if self._item_feat_arrays is None:
            ids = jnp.arange(1, self.num_items)
            feat = ids
        else:
            feat = {f: arr[1:] for f, arr in self._item_feat_arrays.items()}
        return self._apply(params, "encode_item", feat, net_state=net_state)

    def _item_vectors(self, params, states) -> jax.Array:
        """Catalog encoding that forwards net collections (batch_stats) to the
        base implementation; model-specific overrides keep their (params)
        signature."""
        net = (states or {}).get("net") if isinstance(states, dict) else None
        if net and type(self)._compute_item_vector is BaseRetriever._compute_item_vector:
            return self._compute_item_vector(params, net)
        return self._compute_item_vector(params)

    def _train_needs_item_vector(self) -> bool:
        """Whether the training path reads the cached item-vector states:
        full-score losses, and sampling methods that mine over the catalog."""
        if self.sampler is None and isinstance(self.loss_fn, FullScoreLoss):
            return True
        return self.config["train"].get("sampling_method", "none") != "none"

    def _sampler_is_stateful(self) -> bool:
        return isinstance(self.sampler, Sampler) and \
            type(self.sampler).update is not Sampler.update

    def _ann_enabled(self) -> bool:
        return str(self.config["train"].get("ann") or "").lower() == "ivf"

    def _device_epoch_refresh_fn(self):
        """Jit-safe per-epoch refresh: re-encode the catalog and re-index the
        sampler (k-means / LSH are pure JAX, ops/kmeans.py) so block fitting
        can run the refresh inside the epoch scan. RetrieverSampler is
        excluded: its state derives from ANOTHER model's host-side params,
        which a jit would bake in as stale constants."""
        need_vec = self._train_needs_item_vector()
        stateful = self._sampler_is_stateful()
        if not (need_vec or stateful):
            return None
        if isinstance(self.sampler, RetrieverSampler):
            return None

        def refresh(params, states, rng):
            new = dict(states)
            item_vector = self._item_vectors(params, states)
            new["item_vector"] = item_vector
            if stateful:
                sampler_state = self.sampler.update(rng, item_vector)
                if sampler_state != ():
                    new["sampler"] = sampler_state
            return new

        return refresh

    def _epoch_refresh(self, nepoch: int):
        # eval steps encode the catalog inside their own jit; during training
        # only refresh what the train step actually consumes (mirrors the
        # reference's per-epoch _update_item_vector + sampler.update).
        if nepoch >= 0 and not (self._train_needs_item_vector() or self._sampler_is_stateful()):
            return
        if not hasattr(self, "_item_vec_fn"):
            self._item_vec_fn = jax.jit(
                lambda p, net: self._item_vectors(p, {"net": net} if net else {}))
        item_vector = self._item_vec_fn(self.params, self.states.get("net"))
        self.states["item_vector"] = item_vector
        if self._sampler_is_stateful():
            sampler_state = self.sampler.update(self.next_rng(), item_vector)
            if sampler_state != ():
                self.states["sampler"] = sampler_state
        if nepoch < 0 and self._ann_enabled():
            # approximate-ANN index for inference/evaluate (train.ann: ivf).
            # The reference's faiss path is broken (build_ann_index never
            # defined, reference baseretriever.py:140); this one works.
            from ...ann.ivf import build_ivf
            tc = self.config["train"]
            self.states["ann"] = build_ivf(
                self.next_rng(), item_vector,
                num_clusters=tc.get("ann_clusters"),
                cap_factor=float(tc.get("ann_cap_factor", 2.0)))

    # ------------------------------------------------------------------
    # forward / sampling / loss
    # ------------------------------------------------------------------
    def forward(self, params, batch, rng, states, full_score: bool = False,
                return_query: bool = False, return_item: bool = False,
                return_neg_item: bool = False, return_neg_id: bool = False,
                training: bool = True) -> Dict[str, Any]:
        output: Dict[str, Any] = {}
        net_state = states.get("net") if isinstance(states, dict) else None
        rng_q, rng_s = jax.random.split(rng)
        pos_item_feat = self._get_item_feat(batch)
        pos_vec = self._apply(params, "encode_item", pos_item_feat,
                              rng=rng_q, training=training, net_state=net_state)
        query = self._apply(params, "encode_query", self._get_query_feat(batch),
                            rng=rng_q, training=training, net_state=net_state)
        pos_score = self._apply(params, "score", query, pos_vec)
        if batch[self.fiid].ndim > 1:
            pos_score = jnp.where(batch[self.fiid] == 0, -jnp.inf, pos_score)

        if self.sampler is not None:
            neg_count = self.neg_count
            assert neg_count, "`negative_count` is required when a sampler is used"
            (log_pos_prob, neg_ids, log_neg_prob) = self.sampling(
                params, batch, rng_s, states, neg_count,
                excluding_hist=self.config["train"].get("excluding_hist", False),
                method=self.config["train"].get("sampling_method", "none"),
                query=jax.lax.stop_gradient(query))
            neg_vec = self._apply(params, "encode_item", self._get_item_feat(neg_ids),
                                  rng=rng_q, training=training, net_state=net_state)
            neg_score = self._apply(params, "score", query, neg_vec)
            output["score"] = {
                "pos_score": pos_score,
                "log_pos_prob": jax.lax.stop_gradient(log_pos_prob),
                "neg_score": neg_score,
                "log_neg_prob": jax.lax.stop_gradient(log_neg_prob)}
            if return_neg_item:
                output["neg_item"] = neg_vec
            if return_neg_id:
                output["neg_id"] = neg_ids
        else:
            output["score"] = {"pos_score": pos_score}
            if full_score:
                # differentiable full-catalog scores (reference baseretriever.py:184)
                item_vec = self._item_vectors(params, states)
                output["score"]["all_score"] = self._apply(params, "score", query, item_vec)

        if return_query:
            output["query"] = query
        if return_item:
            output["item"] = pos_vec
        return output

    def sampling(self, params, batch, rng, states, num_neg, method: str = "none",
                 excluding_hist: bool = False, t: float = 1.0, query=None
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        pos_items = batch.get(self.fiid)
        pos_2d = pos_items[:, None] if (pos_items is not None and pos_items.ndim == 1) else pos_items
        user_hist = batch.get("user_hist", batch.get(self.fiid))
        if isinstance(num_neg, int):
            num_neg = [num_neg, num_neg]
        sampler_state = states.get("sampler", ())
        if query is None:
            query = jax.lax.stop_gradient(
                self._apply(params, "encode_query", self._get_query_feat(batch),
                            net_state=states.get("net") if isinstance(states, dict) else None))
        item_vector = jax.lax.stop_gradient(states.get("item_vector"))

        if method == "none":
            if excluding_hist and not isinstance(self.sampler, MaskedUniformSampler):
                sampler = MaskedUniformSampler(self.num_items)
                out = sampler(sampler_state, rng, query, num_neg[1],
                              pos_items=pos_items, user_hist=user_hist)
            else:
                kwargs = {}
                if isinstance(self.sampler, MaskedUniformSampler):
                    kwargs["user_hist"] = user_hist
                if isinstance(self.sampler, RetrieverSampler):
                    # the wrapped retriever encodes its own query from the
                    # batch (reference ann/sampler.py:71-76)
                    kwargs["batch"] = batch
                out = self.sampler(sampler_state, rng, query, num_neg[1],
                                   pos_items=pos_items, **kwargs)
            log_pos_prob, neg_id, log_neg_prob = out
        elif method == "toprand":
            _, topk_items = self._topk_from_scores(
                self._apply(params, "score", query, item_vector), num_neg[0],
                user_hist if excluding_hist else None)
            ridx = jax.random.randint(rng, (topk_items.shape[0], num_neg[1]), 0, num_neg[0])
            neg_id = jnp.take_along_axis(topk_items, ridx, axis=-1)
            log_neg_prob = jnp.zeros_like(neg_id, dtype=jnp.float32)
            log_pos_prob = None if pos_items is None else jnp.zeros_like(pos_items, dtype=jnp.float32)
        elif method == "top&rand":
            k0 = num_neg[1] // 2
            _, neg_top = self._topk_from_scores(
                self._apply(params, "score", query, item_vector), max(k0, 1),
                user_hist if excluding_hist else None)
            neg_top = neg_top[:, :k0]
            rand = jax.random.randint(rng, (neg_top.shape[0], num_neg[1] - k0),
                                      1, self.num_items)
            neg_id = jnp.concatenate([neg_top, rand], axis=-1)
            log_neg_prob = jnp.zeros_like(neg_id, dtype=jnp.float32)
            log_pos_prob = None if pos_items is None else jnp.zeros_like(pos_items, dtype=jnp.float32)
        elif method == "brute":
            all_score = self._apply(params, "score", query, item_vector) / t
            logits = all_score
            if excluding_hist:
                logits = self._mask_hist_scores(logits, user_hist)
            log_prob_all = jax.nn.log_softmax(all_score, axis=-1)  # over real items
            num_pos = pos_2d.shape[-1] if pos_2d is not None else 1
            draws = jax.random.categorical(
                rng, logits, axis=-1,
                shape=(num_neg[1] * num_pos, logits.shape[0])).T      # [B, neg*P]
            neg_id = draws + 1
            log_neg_prob = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), draws, axis=-1)
            if pos_2d is not None:
                log_pos_prob = jnp.where(
                    pos_2d > 0,
                    jnp.take_along_axis(log_prob_all, jnp.maximum(pos_2d - 1, 0), axis=-1),
                    -jnp.inf)
            else:
                log_pos_prob = None
        elif method in ("sir", "dns"):
            pool_out = self.sampling(params, batch, rng, states, [num_neg[0], num_neg[0]],
                                     method="none", excluding_hist=excluding_hist, query=query)
            log_pos_prob, pool_ids, _ = pool_out
            pool_vec = self._apply(params, "encode_item", self._get_item_feat(pool_ids))
            pool_scores = self._apply(params, "score", query, pool_vec)
            if method == "dns":
                _, top_idx = jax.lax.top_k(pool_scores, num_neg[1])
                neg_id = jnp.take_along_axis(pool_ids, top_idx, axis=-1)
                log_neg_prob = jnp.zeros_like(neg_id, dtype=jnp.float32)
                log_pos_prob = None if pos_items is None else jnp.zeros_like(pos_items, dtype=jnp.float32)
            else:  # sir: sample-importance-resample
                if pos_items is not None:
                    pos_vec = self._apply(params, "encode_item", self._get_item_feat(batch))
                    log_pos_prob = self._apply(params, "score", query, pos_vec)
                rkey = jax.random.fold_in(rng, 1)
                resampled = jax.random.categorical(
                    rkey, pool_scores, axis=-1,
                    shape=(num_neg[1], pool_scores.shape[0])).T
                neg_id = jnp.take_along_axis(pool_ids, resampled, axis=-1)
                log_neg_prob = jnp.take_along_axis(pool_scores, resampled, axis=-1)
        else:
            raise NotImplementedError(f"sampling method {method}")

        if pos_items is not None and log_pos_prob is not None:
            log_pos_prob = log_pos_prob.reshape(pos_items.shape)
        return (None if log_pos_prob is None else jax.lax.stop_gradient(log_pos_prob),
                neg_id, jax.lax.stop_gradient(log_neg_prob))

    # ------------------------------------------------------------------
    # top-k retrieval
    # ------------------------------------------------------------------
    def _mask_hist_scores(self, scores: jax.Array, user_hist: Optional[jax.Array]) -> jax.Array:
        """Set scores of history items to -inf. ``scores`` columns are item
        ids 1..N-1 (column j = item j+1); pad entries (0) are dropped as OOB."""
        if user_hist is None:
            return scores
        n_cols = scores.shape[-1]
        col = jnp.where(user_hist > 0, user_hist - 1, n_cols)  # n_cols is OOB -> dropped
        rows = jnp.arange(scores.shape[0])[:, None]
        return scores.at[rows, col].set(-jnp.inf, mode="drop")

    def _topk_from_scores(self, scores: jax.Array, k: int,
                          user_hist: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        scores = self._mask_hist_scores(scores, user_hist)
        if str(self.config["train"].get("ann") or "").lower() == "approx":
            from ...ops.topk import approx_topk
            score_k, idx = approx_topk(
                scores, k,
                float(self.config["train"].get("ann_recall_target", 0.95)))
        else:
            from ...ops.topk import chunked_topk
            score_k, idx = chunked_topk(scores, k)
        return score_k, idx + 1

    def topk(self, params, batch, k: int, user_hist=None, states=None,
             return_query: bool = False):
        states = states if states is not None else self.states
        item_vector = states.get("item_vector")
        if item_vector is None:
            item_vector = self._item_vectors(params, states)  # fused into caller's jit
        query = self._apply(params, "encode_query", self._get_query_feat(batch),
                            net_state=states.get("net"))
        ann = states.get("ann") if isinstance(states, dict) else None
        mesh = getattr(self, "_mesh", None)
        if (ann is not None and type(self.score_func) is InnerProductScorer
                and query.ndim == 2):
            from ...ann.ivf import ivf_search
            nprobe = int(self.config["train"].get(
                "ann_nprobe", max(1, ann["centers"].shape[0] // 8)))
            score_k, topk_items = ivf_search(ann, item_vector, query, k,
                                             nprobe, user_hist=user_hist)
        elif (mesh is not None and mesh.shape.get("mp", 1) > 1
                and type(self.score_func) is InnerProductScorer
                and query.ndim == 2):
            score_k, topk_items = self._sharded_topk(mesh, query, item_vector,
                                                     k, user_hist)
        else:
            scores = self._apply(params, "score", query, item_vector)
            score_k, topk_items = self._topk_from_scores(scores, k, user_hist)
        if return_query:
            return score_k, topk_items, query
        return score_k, topk_items

    def _sharded_topk(self, mesh, query, item_vector, k: int, user_hist):
        """Distributed exact MIPS top-k when the catalog is mp-sharded: each
        shard scores its rows on its MXU, history-masks in-shard, takes a
        local top-k, and the candidate sets merge via all_gather over ICI —
        no chip ever materializes the full [B, N] score matrix
        (ops/topk.py:sharded_mips_topk; BASELINE config #5)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P
        from ...ops.topk import sharded_mips_topk
        from ...parallel import pad_vocab
        n = item_vector.shape[0]
        mp = mesh.shape["mp"]
        iv = jnp.pad(item_vector, ((0, pad_vocab(n, mp) - n), (0, 0)))
        B = query.shape[0]
        qspec = P("dp") if B % mesh.shape.get("dp", 1) == 0 else P()
        hist = (user_hist if user_hist is not None
                else jnp.zeros((B, 1))).astype(jnp.int32)
        rt = (float(self.config["train"].get("ann_recall_target", 0.95))
              if str(self.config["train"].get("ann") or "").lower() == "approx"
              else None)
        fn = shard_map(
            lambda q, it, h: sharded_mips_topk(q, it, k, "mp", user_hist=h,
                                               n_valid_rows=n,
                                               recall_target=rt),
            mesh=mesh, in_specs=(qspec, P("mp", None), qspec),
            out_specs=(qspec, qspec), check_vma=False)
        v, i = fn(query, iv, hist)
        return v, i + 1

    # ------------------------------------------------------------------
    # train / eval steps
    # ------------------------------------------------------------------
    def _use_fused_softmax(self) -> bool:
        """Use the Pallas fused log-partition kernel for SoftmaxLoss models:
        streams item chunks through VMEM instead of materializing [B(,L), N]
        score matrices (ops/softmax_z.py)."""
        from ..loss_func import SoftmaxLoss
        flag = str(self.config["train"].get("fused_softmax", "auto")).lower()
        if flag == "false":
            return False
        return (type(self.loss_fn) is SoftmaxLoss and self.sampler is None
                and type(self.score_func) is InnerProductScorer
                and (flag == "true" or jax.default_backend() == "tpu"))

    # ------------------------------------------------------------------
    # row-sparse embedding engine: for pure-embedding two-tower models
    # (the BPR class — exactly the regime where catalogs reach 10M+ rows)
    # the dense grad/update path costs 5 full [N, D] HBM round-trips per
    # step (gather cotangent + Adam moments + params). When eligible, the
    # step below differentiates w.r.t. the GATHERED rows and applies
    # row_lazy_adam (models/optim.py) so per-step traffic is O(batch*D).
    # Semantics are identical to learner=sparse_adam's dense lazy_adam —
    # gated to that learner so this is purely an execution strategy.
    # ------------------------------------------------------------------
    def _sparse_rows_enabled(self) -> bool:
        if hasattr(self, "_sparse_rows_flag"):
            return self._sparse_rows_flag
        from ...ann.sampler import PopularSamplerModel
        from ..loss_func import PairwiseLoss
        tc = self.config["train"]
        ok = (
            str(tc.get("sparse_rows", "auto")).lower() != "false"
            and str(tc.get("learner", "adam")).lower() == "sparse_adam"
            and not tc.get("weight_decay")
            and not tc.get("grad_clip_norm")
            and not tc.get("scheduler")
            and str(tc.get("sampling_method", "none")) == "none"
            and not self._mixed_precision()
            and isinstance(self.loss_fn, PairwiseLoss)
            and isinstance(self.sampler, (UniformSampler, MaskedUniformSampler,
                                          PopularSamplerModel))
            and type(self.net) is TwoTowerNet
            and type(self.item_encoder) is Embedding
            and type(self.query_encoder) is Embedding
            and not isinstance(self.score_func, nn.Module)
            and not self.states.get("net")
            and len(self.item_fields) == 1
            and self.query_fields == {self.fuid}
            and (getattr(self, "_mesh", None) is None
                 or self._mesh.shape.get("mp", 1) == 1)
            and len(getattr(self, "optimizers", [None])) == 1
        )
        if ok and self.params is not None:
            paths = {tuple(str(getattr(k, "key", k)) for k in kp)
                     for kp, _ in jax.tree_util.tree_flatten_with_path(self.params)[0]}
            ok = paths == {("item_encoder", "embedding"),
                           ("query_encoder", "embedding")}
        self._sparse_rows_flag = bool(ok)
        if ok:
            self.logger.info("row-sparse embedding updates engaged "
                             "(O(batch) optimizer traffic per step)")
        return self._sparse_rows_flag

    def _grad_step(self, optimizer, params, opt_state, batch, rng, states):
        if self._sparse_rows_enabled() and batch[self.fiid].ndim == 1:
            return self._sparse_grad_step(params, opt_state, batch, rng, states)
        return super()._grad_step(optimizer, params, opt_state, batch, rng,
                                  states)

    def _sparse_grad_step(self, params, opt_state, batch, rng, states):
        from ..optim import LazyAdamState, row_lazy_adam
        lr = float(self.config["train"].get("learning_rate", 1e-3))
        Wq = params["query_encoder"]["embedding"]
        Wi = params["item_encoder"]["embedding"]
        uid = batch[self.fuid]
        iid = batch[self.fiid]
        rng_q, rng_s = jax.random.split(rng)   # forward()'s stream split
        q_rows = Wq.at[uid].get(mode="promise_in_bounds")
        log_pos_prob, neg_ids, log_neg_prob = self.sampling(
            params, batch, rng_s, states, self.neg_count,
            excluding_hist=self.config["train"].get("excluding_hist", False),
            method="none", query=jax.lax.stop_gradient(q_rows))
        label = batch[self.frating]

        def loss_from_rows(q, pos, neg):
            return self.loss_fn(
                label=label, pos_score=self.score_func(q, pos),
                log_pos_prob=log_pos_prob,
                neg_score=self.score_func(q, neg),
                log_neg_prob=log_neg_prob)

        pos_rows = Wi.at[iid].get(mode="promise_in_bounds")
        neg_rows = Wi.at[neg_ids].get(mode="promise_in_bounds")
        loss, (dq, dpos, dneg) = jax.value_and_grad(
            loss_from_rows, argnums=(0, 1, 2))(q_rows, pos_rows, neg_rows)

        (inner,) = opt_state
        count = inner.count + 1
        Wq2, mu_q, nu_q = row_lazy_adam(
            Wq, inner.mu["query_encoder"]["embedding"],
            inner.nu["query_encoder"]["embedding"], uid, dq, count, lr)
        item_ids = jnp.concatenate([iid, neg_ids.reshape(-1)])
        item_g = jnp.concatenate([dpos, dneg.reshape(-1, dneg.shape[-1])])
        Wi2, mu_i, nu_i = row_lazy_adam(
            Wi, inner.mu["item_encoder"]["embedding"],
            inner.nu["item_encoder"]["embedding"], item_ids, item_g, count, lr)
        params = {"item_encoder": {"embedding": Wi2},
                  "query_encoder": {"embedding": Wq2}}
        new_state = (LazyAdamState(
            count=count,
            mu={"item_encoder": {"embedding": mu_i},
                "query_encoder": {"embedding": mu_q}},
            nu={"item_encoder": {"embedding": nu_i},
                "query_encoder": {"embedding": nu_q}}),)
        return params, new_state, loss

    def training_step(self, params, batch, rng, states):
        if self._use_fused_softmax():
            return self._fused_softmax_step(params, batch, rng, states)
        output = self.forward(params, batch, rng, states,
                              full_score=isinstance(self.loss_fn, FullScoreLoss))
        score = output["score"]
        score["label"] = batch[self.frating]
        return self.loss_fn(**score)

    def _fused_softmax_step(self, params, batch, rng, states):
        from ...ops.softmax_z import catalog_logsumexp
        rng_q, _ = jax.random.split(rng)
        net_state = states.get("net") if isinstance(states, dict) else None
        query = self._apply(params, "encode_query", self._get_query_feat(batch),
                            rng=rng_q, training=True, net_state=net_state)
        pos_vec = self._apply(params, "encode_item", self._get_item_feat(batch),
                              rng=rng_q, training=True, net_state=net_state)
        pos_score = self._apply(params, "score", query, pos_vec)
        if batch[self.fiid].ndim > 1:
            pos_score = jnp.where(batch[self.fiid] == 0, -jnp.inf, pos_score)
        item_vec = self._item_vectors(params, states)
        d = query.shape[-1]
        logz = catalog_logsumexp(query.reshape(-1, d), item_vec) \
            .reshape(query.shape[:-1])
        if logz.shape == pos_score.shape:
            # per-position softmax: global mean over valid positions
            out = logz - pos_score
            valid = ~jnp.isinf(pos_score)
            return jnp.where(valid, out, 0.0).sum() / jnp.maximum(valid.sum(), 1)
        # one softmax per row shared by several positives
        out = logz[..., None] - pos_score
        valid = ~jnp.isinf(pos_score)
        out = jnp.where(valid, out, 0.0)
        return jnp.mean(out.sum(-1) / jnp.maximum(valid.sum(-1), 1))

    def _make_eval_step(self, metric_names, cutoffs):
        rank_m = eval_mod.get_rank_metrics(metric_names)
        topk = self.config["eval"]["topk"]

        @jax.jit
        def step(params, batch, states):
            bs = batch["_size"]
            B = batch[self.frating].shape[0] if batch[self.frating].ndim else 1
            valid = (jnp.arange(B) < bs).astype(jnp.float32)
            _, topk_items = self.topk(params, batch, topk,
                                      user_hist=batch.get("user_hist"), states=states)
            if batch[self.fiid].ndim > 1:
                target_ids = batch[self.fiid]
                pos_rating = batch[self.frating]
            else:
                target_ids = batch[self.fiid][:, None]
                pos_rating = batch[self.frating][:, None]
            label = jnp.any(
                (topk_items[:, :, None] == target_ids[:, None, :]) & (target_ids[:, None, :] > 0),
                axis=-1)
            out = {}
            for cutoff in cutoffs:
                for name, fn in rank_m:
                    per_sample = fn(label, pos_rating, cutoff)
                    out[f"{name}@{cutoff}"] = (per_sample * valid).sum()
            return out, bs.astype(jnp.float32), None
        return step

    def validation_step(self, params, batch, states):
        pass  # handled by _make_eval_step

    # ------------------------------------------------------------------
    # proposal-distribution protocol (consumed by ann.RetrieverSampler):
    # a trained retriever freezes itself into a sampling proposal — an
    # item-vector snapshot plus parameters — that another model uses as its
    # negative sampler (IRGAN-style adversarial sampling, reference
    # ann/sampler.py:61-78). The reference's analogous ``build_ann_index``
    # is called but never defined (reference baseretriever.py:140); this is
    # the working version.
    # ------------------------------------------------------------------
    def make_sampling_state(self) -> Dict[str, Any]:
        """Snapshot (params + encoded catalog + net collections) of the
        current retriever, consumable by :meth:`sampling_from_state`."""
        if not hasattr(self, "_item_vec_fn"):
            self._item_vec_fn = jax.jit(
                lambda p, net: self._item_vectors(p, {"net": net} if net else {}))
        net = self.states.get("net")
        return {"params": self.params,
                "item_vector": self._item_vec_fn(self.params, net),
                "net": net or {}}

    def sampling_from_state(self, state, rng, batch_or_query, num_neg,
                            method: str = "brute", t: float = 1.0,
                            pos_items=None, user_hist=None
                            ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Sample negatives from a frozen snapshot made by
        :meth:`make_sampling_state` — jit-safe (pure in ``state``)."""
        states: Dict[str, Any] = {"item_vector": state["item_vector"]}
        if state.get("net"):
            states["net"] = state["net"]
        if isinstance(batch_or_query, dict):
            batch, query = dict(batch_or_query), None
        else:
            batch, query = {}, batch_or_query
        if pos_items is not None:
            batch.setdefault(self.fiid, pos_items)
        if user_hist is not None:
            batch.setdefault("user_hist", user_hist)
        return self.sampling(state["params"], batch, rng, states, num_neg,
                             method=method, t=t,
                             excluding_hist=user_hist is not None, query=query)

    # ------------------------------------------------------------------
    # inference helpers (reference baseretriever.py:374-397 public API)
    # ------------------------------------------------------------------
    def predict(self, batch: Dict[str, np.ndarray], k: int):
        batch = batch_to_device(batch)
        if "item_vector" not in self.states:
            self._epoch_refresh(-1)
        score, items = jax.jit(self.topk, static_argnums=(2,))(
            self.params, batch, k, batch.get("user_hist"), self.states)
        return np.asarray(score), np.asarray(items)
