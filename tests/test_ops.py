"""Kernel parity tests: Pallas fused ops vs XLA references, k-means, top-k."""
import jax
import jax.numpy as jnp
import numpy as np

from recstudio_tpu.ops.kmeans import construct_index, kmeans
from recstudio_tpu.ops.softmax_z import (catalog_logsumexp,
                                         catalog_logsumexp_xla)
from recstudio_tpu.ops.topk import streaming_topk, xla_topk


def test_catalog_logsumexp_forward_parity():
    q = jax.random.normal(jax.random.PRNGKey(0), (48, 32))
    it = jax.random.normal(jax.random.PRNGKey(1), (300, 32))
    a = np.asarray(catalog_logsumexp(q, it, 16, 128))
    b = np.asarray(catalog_logsumexp_xla(q, it))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_catalog_logsumexp_grad_parity():
    q = jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    it = jax.random.normal(jax.random.PRNGKey(1), (200, 32))
    g = jax.random.normal(jax.random.PRNGKey(2), (16,))
    f1 = lambda q, it: (catalog_logsumexp(q, it, 16, 128) * g).sum()
    f2 = lambda q, it: (catalog_logsumexp_xla(q, it) * g).sum()
    g1 = jax.grad(f1, argnums=(0, 1))(q, it)
    g2 = jax.grad(f2, argnums=(0, 1))(q, it)
    # f32 recompute in the kernel: allow small relative error
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=2e-2, atol=2e-3)


def test_streaming_topk_matches_dense():
    scores = jax.random.normal(jax.random.PRNGKey(0), (8, 1000))
    v1, i1 = streaming_topk(scores, 10, chunk=128)
    v2, i2 = xla_topk(scores, 10)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_kmeans_clusters_separated_data():
    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(rng, (50, 8)) + 10.0
    b = jax.random.normal(jax.random.fold_in(rng, 1), (50, 8)) - 10.0
    x = jnp.concatenate([a, b])
    centers, assign = kmeans(jax.random.PRNGKey(3), x, 2, max_iter=20)
    assign = np.asarray(assign)
    # the two blobs must land in different clusters
    assert len(set(assign[:50])) == 1 and len(set(assign[50:])) == 1
    assert assign[0] != assign[50]


def test_construct_index_roundtrip():
    assign = jnp.array([2, 0, 1, 2, 0, 0])
    indices, indptr = construct_index(assign, 3)
    indices, indptr = np.asarray(indices), np.asarray(indptr)
    assert list(indptr) == [0, 3, 4, 6]
    assert set(indices[0:3]) == {1, 4, 5}    # cluster 0
    assert set(indices[3:4]) == {2}          # cluster 1
    assert set(indices[4:6]) == {0, 3}       # cluster 2
