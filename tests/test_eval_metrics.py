"""Unit tests for eval metric kernels against closed-form values."""
import jax.numpy as jnp
import numpy as np
import pytest

from recstudio_tpu import eval as E


def _pred_target():
    # 2 users, topk=5 hit matrices
    pred = jnp.array([
        [True, False, True, False, False],
        [False, False, False, False, False],
    ])
    # user0 has 2 relevant targets, user1 has 3
    target = jnp.array([
        [1.0, 1.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 0.0],
    ])
    return pred, target


def test_recall():
    pred, target = _pred_target()
    out = np.asarray(E.recall(pred, target, 5))
    assert np.allclose(out, [2 / 2, 0.0])


def test_precision():
    pred, target = _pred_target()
    out = np.asarray(E.precision(pred, target, 5))
    assert np.allclose(out, [2 / 5, 0.0])


def test_f1():
    pred, target = _pred_target()
    out = np.asarray(E.f1(pred, target, 5))
    assert np.allclose(out, [2 * 2 / (2 + 5), 0.0])


def test_ndcg():
    pred, target = _pred_target()
    out = np.asarray(E.ndcg(pred, target, 5))
    # user0: dcg = 1/log2(2) + 1/log2(4); ideal = 1/log2(2) + 1/log2(3)
    dcg = 1.0 + 1.0 / np.log2(4)
    idcg = 1.0 + 1.0 / np.log2(3)
    assert np.allclose(out, [dcg / idcg, 0.0], atol=1e-4)


def test_ndcg_all_irrelevant_is_zero():
    pred = jnp.array([[True, True]])
    target = jnp.zeros((1, 3))
    assert np.asarray(E.ndcg(pred, target, 2))[0] == 0.0


def test_mrr():
    pred, target = _pred_target()
    out = np.asarray(E.mrr(pred, target, 5))
    assert np.allclose(out, [1.0, 0.0])
    pred2 = jnp.array([[False, False, True, False, False]])
    assert np.allclose(np.asarray(E.mrr(pred2, target[:1], 5)), [1 / 3])


def test_map():
    pred, target = _pred_target()
    out = np.asarray(E.map_(pred, target, 5))
    # user0: precisions at hits: 1/1, 2/3; ap = (1 + 2/3)/min(2,5)
    assert np.allclose(out, [(1 + 2 / 3) / 2, 0.0], atol=1e-6)


def test_hits():
    pred, target = _pred_target()
    assert np.allclose(np.asarray(E.hits(pred, target, 5)), [1.0, 0.0])


def test_cutoff_truncation():
    pred = jnp.array([[False, True, True]])
    target = jnp.ones((1, 2))
    assert np.asarray(E.recall(pred, target, 1))[0] == 0.0
    assert np.asarray(E.recall(pred, target, 2))[0] == 0.5


def test_auc_perfect_and_random():
    pred = jnp.array([0.9, 0.8, 0.2, 0.1])
    target = jnp.array([1.0, 1.0, 0.0, 0.0])
    assert np.isclose(float(E.auc(pred, target)), 1.0)
    target2 = jnp.array([0.0, 1.0, 0.0, 1.0])
    # ranks: pred sorted asc .1(t=1) .2(0) .8(1) .9(0): rank_sum_pos = 1+3 = 4; u = 4-3=1; auc=1/4
    assert np.isclose(float(E.auc(pred, target2)), 0.25)


def test_auc_with_ties():
    pred = jnp.array([0.5, 0.5, 0.5, 0.5])
    target = jnp.array([1.0, 0.0, 1.0, 0.0])
    assert np.isclose(float(E.auc(pred, target)), 0.5)


def test_logloss_matches_formula():
    pred = jnp.array([0.3, -1.2])
    target = jnp.array([1.0, 0.0])
    expected = np.log1p(np.exp(-0.3)), np.log1p(np.exp(-1.2))
    assert np.allclose(np.asarray(E.logloss(pred, target)), expected, atol=1e-4)


def test_get_eval_metrics_expansion():
    out = E.get_eval_metrics(["ndcg", "recall"], [5, 10])
    assert out == ["ndcg@5", "recall@5", "ndcg@10", "recall@10"]
    out_val = E.get_eval_metrics(["ndcg", "recall"], [5, 10], validation=True)
    assert out_val == ["ndcg@5", "recall@5"]
