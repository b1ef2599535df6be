"""Tensorized evaluation metrics as pure-JAX kernels.

Same semantics as the reference (recstudio/eval/__init__.py:9-243) — rank
metrics consume a boolean hit matrix ``pred[B, topk]`` (column j True iff the
j-th ranked item is a true target) plus the padded target ratings
``target[B, T]`` (>0 marks a real target) — but every kernel returns
**per-sample** values ``[B]`` so the engine can do exact masked/weighted means
across padded static-shape batches under jit. Batch means of these per-sample
values reproduce the reference's batch-size-weighted averages exactly.

Prediction metrics (logloss/mse/mae/accuracy) are per-sample too; AUC is a
global metric computed over the gathered epoch scores (reference
baseranker.py:179-182,231-245).
"""
from __future__ import annotations

from typing import Dict, List, Tuple, Union

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# rank metrics: pred [B, topk] bool, target [B, T] float ratings, cutoff k
# --------------------------------------------------------------------------
def recall(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    count = (target > 0).sum(-1)
    hits_k = pred[:, :k].sum(-1).astype(jnp.float32)
    return hits_k / jnp.maximum(count, 1)


def precision(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    return pred[:, :k].sum(-1).astype(jnp.float32) / k


def f1(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    count = (target > 0).sum(-1)
    hits_k = pred[:, :k].sum(-1).astype(jnp.float32)
    return 2.0 * hits_k / jnp.maximum(count + k, 1)


def map_(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    count = (target > 0).sum(-1)
    p = pred[:, :k].astype(jnp.float32)
    prec_at_i = p.cumsum(-1) / jnp.arange(1, k + 1, dtype=jnp.float32)
    ap = (prec_at_i * p).sum(-1) / jnp.maximum(jnp.minimum(count, k), 1)
    return ap


def _dcg(rel: jax.Array, k: int) -> jax.Array:
    k = min(k, rel.shape[1])
    denom = jnp.log2(jnp.arange(k, dtype=jnp.float32) + 2.0)
    return (rel[:, :k] / denom).sum(-1)


def ndcg(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    pred_dcg = _dcg(pred.astype(jnp.float32), k)
    rel_sorted = jnp.sort((target > 0).astype(jnp.float32), axis=-1)[:, ::-1]
    ideal = _dcg(rel_sorted, k)
    all_irrelevant = jnp.all(target <= jnp.finfo(jnp.float32).eps, axis=-1)
    return jnp.where(all_irrelevant, 0.0, pred_dcg / jnp.where(ideal > 0, ideal, 1.0))


def mrr(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    p = pred[:, :k]
    pos = jnp.arange(1, k + 1, dtype=jnp.float32)
    first = jnp.min(jnp.where(p, pos, jnp.inf), axis=-1)
    return jnp.where(jnp.isinf(first), 0.0, 1.0 / first)


def hits(pred: jax.Array, target: jax.Array, k: int) -> jax.Array:
    return jnp.any(pred[:, :k], axis=-1).astype(jnp.float32)


# --------------------------------------------------------------------------
# prediction metrics: pred [B] scores/logits, target [B] labels
# --------------------------------------------------------------------------
def logloss(pred: jax.Array, target: jax.Array) -> jax.Array:
    # binary cross entropy with logits, per sample
    return jax.nn.softplus(pred) - pred * target


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.square(pred - target)


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target)


def accuracy(pred: jax.Array, target: jax.Array, thres: float = 0.5) -> jax.Array:
    return ((pred > thres) == (target > 0.5)).astype(jnp.float32)


def auc(pred: jax.Array, target: jax.Array, weight: jax.Array | None = None) -> jax.Array:
    """Global AUC (Mann-Whitney), tie-aware, with optional sample weights.

    AUC = P(score_pos > score_neg) + 0.5 * P(score_pos == score_neg),
    computed in O(n log n) via sorted cumulative negative mass per tie group.
    ``weight`` lets padded rows (weight 0) be excluded exactly.
    """
    n = pred.shape[0]
    if weight is None:
        weight = jnp.ones_like(pred, dtype=jnp.float32)
    order = jnp.argsort(pred)
    p = pred[order]
    t = (target[order] > 0).astype(jnp.float32)
    w = weight[order].astype(jnp.float32)
    pos_w = w * t
    neg_w = w * (1.0 - t)
    is_new = jnp.concatenate([jnp.array([True]), p[1:] != p[:-1]])
    gid = jnp.cumsum(is_new) - 1
    cum_neg = jnp.cumsum(neg_w)
    group_neg = jax.ops.segment_sum(neg_w, gid, num_segments=n)
    group_cum_end = jax.ops.segment_max(cum_neg, gid, num_segments=n)
    neg_before = group_cum_end - group_neg
    contrib = pos_w * (neg_before[gid] + 0.5 * group_neg[gid])
    n_pos = pos_w.sum()
    n_neg = neg_w.sum()
    return jnp.where((n_pos > 0) & (n_neg > 0),
                     contrib.sum() / jnp.maximum(n_pos * n_neg, 1.0), 0.0)


metric_dict = {
    "ndcg": ndcg,
    "precision": precision,
    "recall": recall,
    "map": map_,
    "hit": hits,
    "mrr": mrr,
    "f1": f1,
    "mse": mse,
    "mae": mae,
    "auc": auc,
    "logloss": logloss,
    "accuracy": accuracy,
}

_TOPK_METRICS = {"ndcg", "precision", "recall", "map", "mrr", "hit", "f1"}
_PRED_METRICS = {"mae", "mse", "auc", "logloss", "accuracy", "precision", "recall", "f1"}
_GLOBAL_METRICS = {"auc"}


def get_rank_metrics(metric) -> List[Tuple[str, callable]]:
    metric = metric if isinstance(metric, list) else [metric]
    return [(m, metric_dict[m]) for m in metric if m in _TOPK_METRICS and m in metric_dict]


def get_pred_metrics(metric) -> List[Tuple[str, callable]]:
    metric = metric if isinstance(metric, list) else [metric]
    return [(m, metric_dict[m]) for m in metric if m in _PRED_METRICS and m in metric_dict]


def get_global_metrics(metric) -> List[Tuple[str, callable]]:
    if not isinstance(metric, (list, dict)):
        metric = [metric]
    return [(m, metric_dict[m]) for m in metric if m in _GLOBAL_METRICS and m in metric_dict]


def get_eval_metrics(metric_names: Union[List[str], str], cutoffs: Union[List[int], int],
                     validation: bool = False) -> List[str]:
    metric_names = metric_names if isinstance(metric_names, list) else [metric_names]
    rank_m = {m[0] for m in get_rank_metrics(metric_names)}
    pred_m = [m[0] for m in get_pred_metrics(metric_names)]
    if cutoffs is not None:
        cutoffs = cutoffs if isinstance(cutoffs, list) else [cutoffs]
        if validation:
            cutoffs = cutoffs[:1]
        return [f"{m}@{cut}" if m in rank_m else m for cut in cutoffs for m in metric_names]
    return pred_m
