"""Scorer shape-polymorphism and value tests."""
import jax.numpy as jnp
import numpy as np

from recstudio_tpu.models.scorer import (CosineScorer, EuclideanScorer,
                                         InnerProductScorer, NormScorer)


def test_inner_product_shapes():
    s = InnerProductScorer()
    B, D, N, neg, L = 4, 8, 16, 3, 5
    q = jnp.ones((B, D))
    assert s(q, jnp.ones((B, D))).shape == (B,)
    assert s(q, jnp.ones((B, neg, D))).shape == (B, neg)
    assert s(q, jnp.ones((N, D))).shape == (B, N)
    ql = jnp.ones((B, L, D))
    assert s(ql, jnp.ones((B, L, D))).shape == (B, L)
    assert s(ql, jnp.ones((B, L, neg, D))).shape == (B, L, neg)


def test_inner_product_values():
    s = InnerProductScorer()
    q = jnp.array([[1.0, 2.0]])
    items = jnp.array([[3.0, 4.0], [5.0, 6.0]])
    out = np.asarray(s(q, items))
    assert np.allclose(out, [[11.0, 17.0]])


def test_cosine():
    s = CosineScorer()
    q = jnp.array([[1.0, 0.0]])
    items = jnp.array([[1.0, 0.0], [0.0, 2.0]])
    out = np.asarray(s(q, items))
    assert np.allclose(out, [[1.0, 0.0]], atol=1e-6)


def test_euclidean_is_negative_sq_distance():
    s = EuclideanScorer()
    q = jnp.array([[0.0, 0.0]])
    items = jnp.array([[3.0, 4.0]])
    assert np.isclose(float(s(q, items)[0]), -25.0)


def test_norm_scorer():
    s = NormScorer(p=2)
    q = jnp.array([[0.0, 0.0]])
    items = jnp.array([[3.0, 4.0]])
    assert np.isclose(float(s(q, items)[0]), -5.0)
