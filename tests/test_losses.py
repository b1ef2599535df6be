"""Loss-function unit tests against closed-form values."""
import jax.numpy as jnp
import numpy as np

from recstudio_tpu.models import loss_func as L


def _sigmoid(x):
    x = np.asarray(x)
    return 1 / (1 + np.exp(-x))


def test_bpr_loss():
    pos = jnp.array([2.0, 1.0])
    neg = jnp.array([[1.0, 0.0], [1.0, 2.0]])
    out = float(L.BPRLoss()(None, pos, None, neg, None))
    expected = -np.mean([np.mean(np.log(_sigmoid([1.0, 2.0]))),
                         np.mean(np.log(_sigmoid([0.0, -1.0])))])
    assert np.isclose(out, expected, atol=1e-4)


def test_sampled_softmax_correction():
    pos = jnp.array([1.0])
    neg = jnp.array([[0.5, 0.2]])
    logq_pos = jnp.array([-1.0])
    logq_neg = jnp.array([[-2.0, -3.0]])
    out = float(L.SampledSoftmaxLoss()(None, pos, logq_pos, neg, logq_neg))
    z = np.logaddexp.reduce([1.0 + 1.0, 0.5 + 2.0, 0.2 + 3.0])
    assert np.isclose(out, z - 2.0, atol=1e-5)


def test_softmax_loss_full():
    pos = jnp.array([1.0])
    all_score = jnp.array([[1.0, 0.0, -1.0]])
    out = float(L.SoftmaxLoss()(None, pos, all_score))
    z = np.logaddexp.reduce([1.0, 0.0, -1.0])
    assert np.isclose(out, z - 1.0, atol=1e-4)


def test_softmax_loss_padding():
    # padded positions marked with -inf pos_score must be excluded
    pos = jnp.array([[1.0, -jnp.inf]])
    all_score = jnp.array([[[1.0, 0.0], [1.0, 0.0]]])
    out = float(L.SoftmaxLoss()(None, pos, all_score))
    z = np.logaddexp(1.0, 0.0)
    assert np.isclose(out, z - 1.0, atol=1e-4)


def test_bce_loss():
    pos = jnp.array([0.7])
    neg = jnp.array([[0.2, -0.4]])
    out = float(L.BinaryCrossEntropyLoss()(None, pos, None, neg, None))
    expected = -np.log(_sigmoid(0.7)) + np.mean([np.log1p(np.exp(0.2)), np.log1p(np.exp(-0.4))])
    assert np.isclose(out, expected, atol=1e-4)


def test_infonce_ignores_proposals():
    pos = jnp.array([1.0])
    neg = jnp.array([[0.5]])
    a = float(L.InfoNCELoss()(None, pos, jnp.array([-3.0]), neg, jnp.array([[-5.0]])))
    b = float(L.InfoNCELoss()(None, pos, jnp.zeros(1), neg, jnp.zeros((1, 1))))
    assert np.isclose(a, b)


def test_hinge_loss():
    pos = jnp.array([1.0])
    neg = jnp.array([[2.5, 0.0]])
    out = float(L.HingeLoss(margin=2.0)(None, pos, None, neg, None))
    assert np.isclose(out, 2.5 - 1.0 + 2.0)


def test_ccl_loss():
    pos = jnp.array([2.0])
    neg = jnp.array([[0.0, 10.0]])
    m, w = 0.8, 0.5
    out = float(L.CCLLoss(margin=m, neg_weight=w)(None, pos, None, neg, None))
    neg_part = np.mean([max(_sigmoid(0.0) - m, 0), max(_sigmoid(10.0) - m, 0)])
    assert np.isclose(out, (1 - _sigmoid(2.0)) + w * neg_part, atol=1e-6)


def test_pointwise_bce_with_logits():
    label = jnp.array([1.0, 0.0])
    score = jnp.array([0.3, -0.2])
    out = float(L.BCEWithLogitLoss()(label, score))
    expected = np.mean([np.log1p(np.exp(-0.3)), np.log1p(np.exp(-0.2))])
    assert np.isclose(out, expected, atol=1e-4)


def test_zero_pad_rows_skips_float_kernel():
    """zero_pad_rows_in_grads zeroes [PAD] vocab rows but must NOT zero the
    fused float-field kernel's row 0 (that row is field I1's weights, not a
    pad entry — regression for a silent no-train bug on the first float
    field of every fm model)."""
    import jax.numpy as jnp
    import numpy as np
    from recstudio_tpu.models.init import zero_pad_rows_in_grads

    g = {"embedding": {"token_embedding": jnp.ones((5, 4)),
                       "dense_embedding": jnp.ones((3, 4)),
                       "dense_embedding_bias": jnp.ones((3, 4))}}
    out = zero_pad_rows_in_grads(g)
    assert np.all(np.asarray(out["embedding"]["token_embedding"])[0] == 0)
    assert np.all(np.asarray(out["embedding"]["dense_embedding"])[0] == 1)
    assert np.all(np.asarray(out["embedding"]["dense_embedding_bias"])[0] == 1)
