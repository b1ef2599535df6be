"""Kernel parity tests: Pallas fused ops vs XLA references, k-means, top-k."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_fused_mha_forward_parity():
    from recstudio_tpu.ops.attention import fused_mha, mha_xla
    B, H, L, Dh = 3, 2, 20, 16
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, L, Dh))
               for i in range(3))
    # padding mask with at least one valid key per row
    pad = jax.random.bernoulli(jax.random.fold_in(key, 3), 0.3, (B, L))
    pad = pad.at[:, 0].set(False)
    causal = jnp.triu(jnp.ones((L, L), bool), 1)
    neg = jnp.finfo(jnp.float32).min
    pad_add = jnp.where(pad, neg, 0.0)
    attn_add = jnp.where(causal, neg, 0.0)
    a = np.asarray(fused_mha(q, k, v, pad, causal))
    b = np.asarray(mha_xla(q, k, v, pad_add, attn_add))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_fused_mha_no_mask_and_grads():
    from recstudio_tpu.ops.attention import fused_mha, mha_xla
    B, H, L, Dh = 2, 2, 13, 8
    key = jax.random.PRNGKey(7)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, L, Dh))
               for i in range(3))
    a = np.asarray(fused_mha(q, k, v))
    b = np.asarray(mha_xla(q, k, v, None, None))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    f1 = lambda q, k, v: fused_mha(q, k, v).sum()
    f2 = lambda q, k, v: mha_xla(q, k, v, None, None).sum()
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_lazy_adam_only_updates_touched_rows():
    import optax
    from recstudio_tpu.models.optim import lazy_adam
    emb = jnp.ones((6, 4))
    g = jnp.zeros((6, 4)).at[jnp.array([1, 3])].set(0.5)
    opt = lazy_adam(0.1)
    st = opt.init(emb)
    upd, st = opt.update(g, st, emb)
    upd = np.asarray(upd)
    assert np.all(upd[[0, 2, 4, 5]] == 0.0), "untouched rows must not move"
    assert np.all(upd[[1, 3]] != 0.0)
    # dense gradient: identical to stock adam
    gd = jax.random.normal(jax.random.PRNGKey(0), (6, 4)) + 0.1
    o1, o2 = lazy_adam(0.1), optax.adam(0.1)
    s1, s2 = o1.init(emb), o2.init(emb)
    for _ in range(3):
        u1, s1 = o1.update(gd, s1, emb)
        u2, s2 = o2.update(gd, s2, emb)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-5, atol=1e-6)


def test_attention_gated_grus():
    from recstudio_tpu.models.module import AGRU, AUGRU, AIGRU
    B, L, D, H = 2, 5, 4, 6
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
    att = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, L)), -1)
    for mod in (AGRU(H), AUGRU(H)):
        params = mod.init(jax.random.PRNGKey(2), x, att)
        hs, h_last = mod.apply(params, x, att)
        assert hs.shape == (B, L, H) and h_last.shape == (B, H)
        np.testing.assert_allclose(np.asarray(hs[:, -1]), np.asarray(h_last),
                                   rtol=1e-6)
        # zero attention on AGRU freezes the hidden state at 0
        if isinstance(mod, AGRU):
            hs0, _ = mod.apply(params, x, jnp.zeros((B, L)))
            np.testing.assert_allclose(np.asarray(hs0), 0.0, atol=1e-7)
    aigru = AIGRU(H)
    params = aigru.init(jax.random.PRNGKey(3), x, att)
    out = aigru.apply(params, x, att)
    out = out[0] if isinstance(out, tuple) else out
    assert out.shape[0] == B


@pytest.mark.parametrize("L", [128, 1024])
def test_flash_attention_parity(L):
    """Tiled flash path must match the XLA reference at multi-tile lengths
    (causal + padding masks). L=128 exercises the single-tile kernel, 1024
    the online-softmax KV loop."""
    from recstudio_tpu.ops.attention import fused_mha, mha_xla
    B, H, Dh = 2, 2, 32
    key = jax.random.PRNGKey(3)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, L, Dh))
               for i in range(3))
    pad = jax.random.bernoulli(jax.random.fold_in(key, 3), 0.3, (B, L))
    pad = pad.at[:, 0].set(False)
    causal = jnp.triu(jnp.ones((L, L), bool), 1)
    neg = jnp.finfo(jnp.float32).min
    a = np.asarray(fused_mha(q, k, v, pad, causal))
    b = np.asarray(mha_xla(q, k, v, jnp.where(pad, neg, 0.0),
                           jnp.where(causal, neg, 0.0)))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_flash_attention_parity_4k():
    from recstudio_tpu.ops.attention import fused_mha, mha_xla
    B, H, L, Dh = 1, 1, 4096, 64
    key = jax.random.PRNGKey(5)
    q, k, v = (0.5 * jax.random.normal(jax.random.fold_in(key, i), (B, H, L, Dh))
               for i in range(3))
    causal = jnp.triu(jnp.ones((L, L), bool), 1)
    neg = jnp.finfo(jnp.float32).min
    a = np.asarray(fused_mha(q, k, v, None, causal))
    b = np.asarray(mha_xla(q, k, v, None, jnp.where(causal, neg, 0.0)))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_flash_attention_grads_masked():
    """Tiled flash BACKWARD (dq/dk/dv kernels) vs XLA autodiff, with causal
    + padding masks at a multi-tile length."""
    from recstudio_tpu.ops.attention import fused_mha, mha_xla
    B, H, L, Dh = 2, 2, 1024, 32
    key = jax.random.PRNGKey(11)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, L, Dh))
               for i in range(3))
    pad = jax.random.bernoulli(jax.random.fold_in(key, 3), 0.3, (B, L))
    pad = pad.at[:, 0].set(False)
    causal = jnp.triu(jnp.ones((L, L), bool), 1)
    neg = jnp.finfo(jnp.float32).min

    def loss_fused(q, k, v):
        return (fused_mha(q, k, v, pad, causal) ** 2).sum()

    def loss_xla(q, k, v):
        return (mha_xla(q, k, v, jnp.where(pad, neg, 0.0),
                        jnp.where(causal, neg, 0.0)) ** 2).sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-4, atol=5e-4)


def test_flash_attention_grads():
    from recstudio_tpu.ops.attention import fused_mha, mha_xla
    B, H, L, Dh = 1, 2, 640, 16  # > threshold -> flash path
    key = jax.random.PRNGKey(9)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, H, L, Dh))
               for i in range(3))
    g1 = jax.grad(lambda q, k, v: fused_mha(q, k, v).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: mha_xla(q, k, v, None, None).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# fused transformer layer (ops/transformer_layer.py)
# ---------------------------------------------------------------------------
def _ftl_setup(B=5, L=20, D=64, H=2, F=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    params = {
        "qkv_kernel": jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.1, jnp.float32),
        "qkv_bias": jnp.asarray(rng.normal(size=(3 * D,)) * 0.1, jnp.float32),
        "out_kernel": jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32),
        "out_bias": jnp.zeros((D,), jnp.float32),
        "norm1_scale": jnp.ones((D,)), "norm1_bias": jnp.zeros((D,)),
        "ffn1_kernel": jnp.asarray(rng.normal(size=(D, F)) * 0.1, jnp.float32),
        "ffn1_bias": jnp.zeros((F,), jnp.float32),
        "ffn2_kernel": jnp.asarray(rng.normal(size=(F, D)) * 0.1, jnp.float32),
        "ffn2_bias": jnp.zeros((D,), jnp.float32),
        "norm2_scale": jnp.ones((D,)), "norm2_bias": jnp.zeros((D,)),
    }
    # pad keys randomly but keep position 0 unpadded: a causal row with ALL
    # keys masked has no defined output (both implementations emit garbage
    # there by design — the engine's pooling/loss never reads such rows)
    pad = np.asarray(rng.random((B, L)) < 0.2)
    pad[:, 0] = False
    causal = jnp.triu(jnp.ones((L, L), bool), 1)
    return x, params, jnp.asarray(pad), causal, (B, L, D, H, F)


def _ftl_ref(x, params, pad, causal, H, eps=1e-6):
    """Reference post-LN layer (the TransformerLayer XLA path semantics)."""
    B, L, D = x.shape
    Dh = D // H
    qkv = x @ params["qkv_kernel"] + params["qkv_bias"]
    q, k, v = jnp.split(qkv, 3, -1)
    heads = lambda t: t.reshape(B, L, H, Dh).transpose(0, 2, 1, 3)
    q, k, v = heads(q), heads(k), heads(v)
    s = (q @ k.transpose(0, 1, 3, 2)) / (Dh ** 0.5)
    neg = jnp.finfo(jnp.float32).min
    if causal is not None:
        s = s + jnp.where(causal, neg, 0.0)[None, None]
    if pad is not None:
        s = s + jnp.where(pad, neg, 0.0)[:, None, None, :]
    s = jnp.maximum(s, neg)
    P = jax.nn.softmax(s, -1)
    A = (P @ v).transpose(0, 2, 1, 3).reshape(B, L, D)
    o = A @ params["out_kernel"] + params["out_bias"]

    def ln(t, sc, b):
        mu = t.mean(-1, keepdims=True)
        xc = t - mu
        var = (xc * xc).mean(-1, keepdims=True)
        return xc * jax.lax.rsqrt(var + eps) * sc + b

    x1 = ln(x + o, params["norm1_scale"], params["norm1_bias"])
    h = jax.nn.gelu(x1 @ params["ffn1_kernel"] + params["ffn1_bias"])
    f = h @ params["ffn2_kernel"] + params["ffn2_bias"]
    return ln(x1 + f, params["norm2_scale"], params["norm2_bias"])


def test_fused_transformer_layer_forward_parity():
    from recstudio_tpu.ops.transformer_layer import fused_transformer_layer
    with jax.default_matmul_precision("float32"):
        x, params, pad, causal, (B, L, D, H, F) = _ftl_setup()
        want = _ftl_ref(x, params, pad, causal, H)
        got = fused_transformer_layer(x, params, pad, causal, H, 0.0, "gelu",
                                      1e-6, True, jnp.int32(7))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=5e-4)
        # eval mode with a nonzero dropout rate must equal the p=0 forward
        got_eval = fused_transformer_layer(x, params, pad, causal, H, 0.5,
                                           "gelu", 1e-6, False, jnp.int32(7))
        np.testing.assert_allclose(np.asarray(got_eval), np.asarray(want),
                                   rtol=1e-3, atol=5e-4)


def test_fused_transformer_layer_bidirectional_and_oddbatch():
    from recstudio_tpu.ops.transformer_layer import fused_transformer_layer
    with jax.default_matmul_precision("float32"):
        # B=3 exercises the pad-to-tile path; no causal mask (BERT4Rec mode)
        x, params, pad, _, (B, L, D, H, F) = _ftl_setup(B=3, L=12, D=32, H=4,
                                                        F=64, seed=1)
        want = _ftl_ref(x, params, pad, None, H)
        got = fused_transformer_layer(x, params, pad, None, H, 0.0, "gelu",
                                      1e-6, False, jnp.int32(0))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=5e-4)


def test_fused_transformer_layer_grads():
    from recstudio_tpu.ops.transformer_layer import fused_transformer_layer
    with jax.default_matmul_precision("float32"):
        x, params, pad, causal, (B, L, D, H, F) = _ftl_setup()
        w = jnp.cos(jnp.arange(B * L * D, dtype=jnp.float32)).reshape(B, L, D)

        def loss_fused(x, params):
            o = fused_transformer_layer(x, params, pad, causal, H, 0.0,
                                        "gelu", 1e-6, True, jnp.int32(7))
            return (o * w).sum()

        def loss_ref(x, params):
            return (_ftl_ref(x, params, pad, causal, H) * w).sum()

        gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, params)
        gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                                   rtol=5e-3, atol=5e-3)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(gp_f[k]), np.asarray(gp_r[k]), rtol=5e-3,
                atol=5e-3 * max(1.0, float(jnp.abs(gp_r[k]).max())),
                err_msg=k)


def test_fused_transformer_layer_dropout():
    from recstudio_tpu.ops.transformer_layer import fused_transformer_layer
    with jax.default_matmul_precision("float32"):
        x, params, pad, causal, (B, L, D, H, F) = _ftl_setup(B=3, L=8, D=16,
                                                             H=2, F=32, seed=2)
        args = (x, params, pad, causal, H, 0.5, "gelu", 1e-6)
        o1 = fused_transformer_layer(*args, True, jnp.int32(123))
        o2 = fused_transformer_layer(*args, True, jnp.int32(123))
        # deterministic per seed (same stream in fwd and bwd)
        assert float(jnp.abs(o1 - o2).max()) == 0.0
        # dropout actually perturbs the output vs eval mode
        o_eval = fused_transformer_layer(*args, False, jnp.int32(123))
        assert float(jnp.abs(o1 - o_eval).max()) > 1e-3
        # different seed -> different masks (threefry stream on CPU; the
        # hardware PRNG path is exercised by the TPU smoke script)
        o3 = fused_transformer_layer(*args, True, jnp.int32(124))
        assert float(jnp.abs(o1 - o3).max()) > 0.0
        g = jax.grad(lambda xx: fused_transformer_layer(
            xx, params, pad, causal, H, 0.5, "gelu", 1e-6, True,
            jnp.int32(3)).sum())(x)
        assert np.isfinite(np.asarray(g)).all()


def test_transformer_layer_module_xla_path_matches_ref():
    """The restructured TransformerLayer (owned params, fused-qkv) must
    reproduce the reference math through its XLA path (CPU default)."""
    from recstudio_tpu.models.module.layers import TransformerLayer
    with jax.default_matmul_precision("float32"):
        x, params, pad, causal, (B, L, D, H, F) = _ftl_setup()
        layer = TransformerLayer(d_model=D, n_head=H, dim_feedforward=F,
                                 dropout=0.0, activation="gelu",
                                 layer_norm_eps=1e-6)
        variables = {"params": params}
        got = layer.apply(variables, x, key_padding_mask=pad, attn_mask=causal,
                          training=False)
        want = _ftl_ref(x, params, pad, causal, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-3, atol=5e-4)


def test_fused_transformer_layer_bf16_mm_close_to_fp32():
    """Under jax.default_matmul_precision('bfloat16') (what train.precision:
    bf16 sets) the fused kernels run one-pass bf16 MXU inputs with f32
    accumulation: outputs and grads must track fp32 within bf16 tolerance."""
    from recstudio_tpu.ops.transformer_layer import fused_transformer_layer
    x, params, pad, causal, (B, L, D, H, F) = _ftl_setup()
    w = jnp.cos(jnp.arange(B * L * D, dtype=jnp.float32)).reshape(B, L, D)

    def loss(x, params):
        o = fused_transformer_layer(x, params, pad, causal, H, 0.0,
                                    "gelu", 1e-6, True, jnp.int32(7))
        return (o * w).sum(), o

    outs = {}
    for prec in ("float32", "bfloat16"):
        with jax.default_matmul_precision(prec):
            (_, o), gx = jax.value_and_grad(loss, has_aux=True)(x, params)
            outs[prec] = (np.asarray(o), np.asarray(gx))
    o32, g32 = outs["float32"]
    o16, g16 = outs["bfloat16"]
    assert not np.array_equal(o32, o16), "bf16 path did not engage"
    np.testing.assert_allclose(o16, o32, rtol=5e-2, atol=3e-2)
    np.testing.assert_allclose(g16, g32, rtol=8e-2,
                               atol=5e-2 * max(1.0, float(np.abs(g32).max())))


def test_fused_embeddings_match_per_field_computation():
    """Embeddings fuses all token fields into one offset-gathered table and
    all float fields into one [Fd, D] kernel (criteo-shape models otherwise
    pay ~5s XLA compile per field); the [..., F, D] output must equal the
    per-field computation in original field order."""
    import numpy as onp
    from recstudio_tpu.models.module.ctr import Embeddings

    specs = (("c1", "token", 7), ("x1", "float", 1), ("c2", "token", 5),
             ("s1", "token_seq", 6), ("x2", "float", 1), ("c3", "token", 11))
    D, B = 4, 3
    rng = onp.random.default_rng(0)
    batch = {
        "c1": jnp.asarray(rng.integers(0, 7, B)),
        "c2": jnp.asarray(rng.integers(0, 5, B)),
        "c3": jnp.asarray(rng.integers(0, 11, B)),
        "x1": jnp.asarray(rng.normal(size=B).astype(onp.float32)),
        "x2": jnp.asarray(rng.normal(size=B).astype(onp.float32)),
        "s1": jnp.asarray(rng.integers(0, 6, (B, 3))),
    }
    mod = Embeddings(specs, D)
    params = mod.init(jax.random.PRNGKey(1), batch)["params"]
    out = onp.asarray(mod.apply({"params": params}, batch))
    assert out.shape == (B, len(specs), D)

    tok = onp.asarray(params["token_embedding"])        # [7+5+11, D]
    dense = onp.asarray(params["dense_embedding"])      # [2, D]
    seq_t = onp.asarray(params["s1_embedding"])         # [6, D]
    offs = {"c1": 0, "c2": 7, "c3": 12}
    exp = onp.zeros_like(out)
    for i, (name, t, _) in enumerate(specs):
        if t == "token":
            exp[:, i] = tok[onp.asarray(batch[name]) + offs[name]]
        elif t == "float":
            k = 0 if name == "x1" else 1
            exp[:, i] = onp.asarray(batch[name])[:, None] * dense[k]
        else:
            ids = onp.asarray(batch[name])
            e = seq_t[ids]                              # [B, L, D]
            valid = (ids > 0).astype(onp.float32)[..., None]
            exp[:, i] = (e * valid).sum(1) / onp.maximum(valid.sum(1), 1.0)
    onp.testing.assert_allclose(out, exp, rtol=1e-6, atol=1e-6)


def test_fused_gather_grad_matches_autodiff_scatter():
    """_fused_gather's sort-free backward (one-hot matmuls for small-vocab
    fields + one scatter for big-vocab fields) must equal the plain autodiff
    scatter-add of the gather, for a mix of small and big vocabs."""
    import numpy as onp
    from recstudio_tpu.models.module.ctr import _fused_gather

    rng = onp.random.default_rng(1)
    sizes = (7, 3000, 12, 128, 1025, 5)   # 3000/1025 take the scatter path
    N = sum(sizes)
    D, B = 6, 257
    offs = onp.concatenate([[0], onp.cumsum(sizes)[:-1]])
    ids = jnp.asarray(onp.stack(
        [rng.integers(0, v, B) + o for v, o in zip(sizes, offs)], 1)
        .astype(onp.int32))
    table = jnp.asarray(rng.normal(size=(N, D)).astype(onp.float32))
    w = jnp.asarray(rng.normal(size=(B, len(sizes), D)).astype(onp.float32))

    gc = jax.grad(lambda t: (_fused_gather(sizes, t, ids) * w).sum())(table)
    gp = jax.grad(lambda t: (t.at[ids].get(mode="promise_in_bounds")
                             * w).sum())(table)
    onp.testing.assert_allclose(onp.asarray(gc), onp.asarray(gp),
                                rtol=1e-5, atol=1e-5)
