"""Reusable NN building blocks (flax.linen).

Covers the reference layer toolkit (recstudio/model/module/layers.py): activation
registry, MLPModule, GRULayer, SeqPoolingLayer (origin/mask/concat/sum/mean/max/
last pooling over padded sequences), AttentionLayer, Dice, Lambda/HStack/VStack
combinators, KMaxPooling, ResidualLayer, CrossCompressUnit, FeatInterLayers —
re-expressed as static-shape, mask-driven JAX modules.
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class SimpleBatchNorm(nn.Module):
    """Batch normalization with calibrated population statistics.

    Training applies use the current batch's statistics (torch BatchNorm1d
    train-mode semantics). Population statistics live in a ``batch_stats``
    collection but are NOT updated through the jitted training loop; instead
    the engine recalibrates them before evaluation by streaming training
    batches through the net with ``mutable=["batch_stats"]`` (see
    ``Recommender._refresh_net_state`` — the torch
    ``swa_utils.update_bn`` recipe, which yields true population statistics
    under the final parameters rather than a momentum EMA). During a
    calibration pass (mutable collection, any ``training`` flag) the layer
    accumulates a cumulative average of batch means/vars. At evaluation it
    normalizes with the calibrated statistics, falling back to batch
    statistics when never calibrated (count == 0)."""
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        count = self.variable("batch_stats", "count",
                              lambda: jnp.zeros((), jnp.float32))
        axes = tuple(range(x.ndim - 1))
        batch_mean = x.mean(axes)
        batch_var = x.var(axes)
        calibrating = (self.is_mutable_collection("batch_stats")
                       and not self.is_initializing())
        if calibrating:
            k = count.value + 1.0
            ra_mean.value = ra_mean.value + (batch_mean - ra_mean.value) / k
            ra_var.value = ra_var.value + (batch_var - ra_var.value) / k
            count.value = k
        if training or calibrating:
            mean, var = batch_mean, batch_var
        else:
            seen = count.value > 0
            mean = jnp.where(seen, ra_mean.value, batch_mean)
            var = jnp.where(seen, ra_var.value, batch_var)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (feat,))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (feat,))
        return y


class Dice(nn.Module):
    """Data-adaptive activation (DIN)."""
    emb_size: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        alpha = self.param("alpha", nn.initializers.zeros, (self.emb_size,))
        norm = SimpleBatchNorm(epsilon=1e-8, use_scale=False, use_bias=False,
                               name="bn")(x, training)
        p = jax.nn.sigmoid(norm)
        return x * p + alpha * x * (1.0 - p)


def get_act(activation, dim: Optional[int] = None):
    """Activation lookup: relu/sigmoid/tanh/leakyrelu/identity/gelu/softmax or Dice."""
    if activation is None or not isinstance(activation, str):
        return activation if activation is not None else (lambda x: x)
    name = activation.lower()
    table = {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "leakyrelu": jax.nn.leaky_relu,
        "leaky_relu": jax.nn.leaky_relu,
        "identity": lambda x: x,
        "none": lambda x: x,
        "gelu": jax.nn.gelu,
        "elu": jax.nn.elu,
        "softmax": lambda x: jax.nn.softmax(x, axis=-1),
        "softplus": jax.nn.softplus,
        "prelu": jax.nn.leaky_relu,
    }
    if name == "dice":
        assert dim is not None, "Dice activation needs a dimension"
        return Dice(dim)
    if name in table:
        return table[name]
    raise ValueError(f"unknown activation: {activation}")


class MLPModule(nn.Module):
    """Plain MLP: Linear(+Dropout)(+BatchNorm)(+activation) per layer.

    ``mlp_layers`` lists every layer width including the input width, like the
    reference (module/layers.py:150). ``last_activation``/``last_bn`` control
    whether the final layer gets activation/batchnorm.
    """
    mlp_layers: Sequence[int]
    activation_func: Any = "relu"
    dropout: float = 0.0
    bias: bool = True
    batch_norm: bool = False
    last_activation: bool = True
    last_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        sizes = list(self.mlp_layers)
        n_layers = len(sizes) - 1
        for i in range(n_layers):
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
            x = nn.Dense(sizes[i + 1], use_bias=self.bias, name=f"dense_{i}")(x)
            is_last = i == n_layers - 1
            if self.batch_norm and (not is_last or self.last_bn):
                x = SimpleBatchNorm(name=f"bn_{i}")(x, training)
            if not is_last or self.last_activation:
                act = get_act(self.activation_func, sizes[i + 1])
                x = act(x, training) if isinstance(act, Dice) else act(x)
        return x


class LambdaLayer(nn.Module):
    lambda_func: Callable

    def __call__(self, *args):
        return self.lambda_func(*args)


class HStackLayer(nn.Module):
    """Apply submodules to the same input, return tuple of outputs."""
    modules_list: Tuple[Any, ...]

    def __call__(self, *args):
        return tuple(m(*args) for m in self.modules_list)


class VStackLayer(nn.Module):
    """Sequential composition (output of one feeds the next)."""
    modules_list: Tuple[Any, ...]

    def __call__(self, x):
        for m in self.modules_list:
            x = m(x) if not isinstance(x, tuple) else m(*x)
        return x


class GRUCell(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, h, x):
        d = self.hidden_size
        gates_x = nn.Dense(3 * d, use_bias=True, name="ih")(x)
        gates_h = nn.Dense(3 * d, use_bias=True, name="hh")(h)
        xr, xz, xn = jnp.split(gates_x, 3, axis=-1)
        hr, hz, hn = jnp.split(gates_h, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


class GRULayer(nn.Module):
    """Unidirectional (stack of) GRU over [B, L, D]; returns full outputs.

    Scan-based: compiles to a single fused loop on TPU.
    """
    input_dim: int
    output_dim: int
    num_layer: int = 1
    dropout: float = 0.0
    return_hidden: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False):
        B, L, _ = x.shape
        for layer in range(self.num_layer):
            cell = GRUCell(self.output_dim, name=f"gru_{layer}")
            scan = nn.scan(lambda c, h, xt: (c(h, xt),) * 2,
                           variable_broadcast="params",
                           split_rngs={"params": False},
                           in_axes=1, out_axes=1)
            h0 = jnp.zeros((B, self.output_dim), x.dtype)
            _, x = scan(cell, h0, x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x  # [B, L, H]


class SeqPoolingLayer(nn.Module):
    """Pooling over padded sequences [B, L, D] with true lengths ``seqlen``.

    pooling_type in {origin, mask, concat, sum, mean, max, last}; identical
    semantics to the reference (module/layers.py:247).
    """
    pooling_type: str = "mean"
    keepdim: bool = False

    def __call__(self, batch_seq_embeddings, seq_len, weight=None, mask_token=None):
        x = batch_seq_embeddings
        pt = self.pooling_type
        if pt == "origin":
            return x
        if weight is not None:
            x = x * weight[..., None]
        B = x.shape[0]
        L = x.shape[-2]
        pos = jnp.arange(L)
        if x.ndim == 4:  # [B, N, L, D] multi-query case
            mask = (pos[None, None, :] < seq_len[..., None]).astype(x.dtype)
        else:
            mask = (pos[None, :] < seq_len[:, None]).astype(x.dtype)
        if pt in ("mask", "concat"):
            raise NotImplementedError(f"{pt} pooling handled by caller in this framework")
        if pt == "sum":
            out = (x * mask[..., None]).sum(-2)
        elif pt == "mean":
            out = (x * mask[..., None]).sum(-2) / jnp.maximum(seq_len[..., None], 1)
        elif pt == "max":
            out = jnp.where(mask[..., None] > 0, x, -jnp.inf).max(-2)
        elif pt == "last":
            gather = jnp.maximum(seq_len - 1, 0)
            if x.ndim == 4:
                out = jnp.take_along_axis(x, gather[..., None, None], axis=-2).squeeze(-2)
            else:
                out = x[jnp.arange(B), gather]
        else:
            raise ValueError(f"unknown pooling {pt}")
        if self.keepdim:
            out = out[..., None, :]
        return out


class MultiHeadAttention(nn.Module):
    """Projected multi-head softmax attention (torch MultiheadAttention
    semantics): used by transformer blocks and the 'multi-head' mode of
    AttentionLayer."""
    q_dim: int
    n_head: int = 1
    dropout: float = 0.0
    bias: bool = True

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, attn_mask=None,
                 need_weight: bool = False, training: bool = False):
        d = self.q_dim
        H = self.n_head
        B, Lq, _ = query.shape
        Lk = key.shape[1]
        q = nn.Dense(d, use_bias=self.bias, name="q_proj")(query) \
            .reshape(B, Lq, H, d // H).transpose(0, 2, 1, 3)
        k = nn.Dense(d, use_bias=self.bias, name="k_proj")(key) \
            .reshape(B, Lk, H, d // H).transpose(0, 2, 1, 3)
        v = nn.Dense(d, use_bias=self.bias, name="v_proj")(value) \
            .reshape(B, Lk, H, d // H).transpose(0, 2, 1, 3)
        from ...ops import attention as attn_ops
        use_fused = (attn_ops.supports_pallas() and not need_weight
                     and not (self.dropout > 0 and training)
                     and (attn_mask is None or attn_mask.ndim == 2))
        if use_fused:
            # fused QK^T -> masked softmax -> V Pallas kernel (ops/attention.py)
            out = attn_ops.fused_mha(q, k, v, key_padding_mask, attn_mask) \
                .transpose(0, 2, 1, 3).reshape(B, Lq, d)
            return nn.Dense(d, use_bias=self.bias, name="out_proj")(out)
        logits = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(d / H)
        neg = jnp.finfo(logits.dtype).min
        if attn_mask is not None:
            m = attn_mask[None, None] if attn_mask.ndim == 2 else attn_mask[:, None]
            logits = jnp.where(m, neg, logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        w = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0:
            w = nn.Dropout(self.dropout, deterministic=not training)(w)
        out = (w @ v).transpose(0, 2, 1, 3).reshape(B, Lq, d)
        out = nn.Dense(d, use_bias=self.bias, name="out_proj")(out)
        if need_weight:
            return out, w.mean(1)
        return out


class AttentionLayer(nn.Module):
    """Reference-compatible attention dispatcher (module/layers.py:322):
    'feedforward' (MLP-scored additive attention — default), 'multi-head', and
    'scaled-dot-product'. ``softmax=False`` keeps raw (0-masked) weights,
    matching NARM/STAMP semantics."""
    q_dim: int
    k_dim: Optional[int] = None
    v_dim: Optional[int] = None
    mlp_layers: Sequence[int] = ()
    activation: str = "sigmoid"
    n_head: int = 1
    dropout: float = 0.0
    bias: bool = True
    attention_type: str = "feedforward"

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None,
                 need_weight: bool = False, attn_mask=None, softmax: bool = False,
                 training: bool = False):
        if self.attention_type == "multi-head":
            return MultiHeadAttention(self.q_dim, self.n_head, self.dropout,
                                      self.bias, name="attn")(
                query, key, value, key_padding_mask=key_padding_mask,
                attn_mask=attn_mask, need_weight=need_weight, training=training)
        if self.attention_type == "feedforward":
            k_dim = self.k_dim if self.k_dim is not None else self.q_dim
            Lq, S = query.shape[1], key.shape[1]
            q = jnp.broadcast_to(query[:, :, None, :],
                                 (query.shape[0], Lq, S, query.shape[-1]))
            k = jnp.broadcast_to(key[:, None, :, :],
                                 (key.shape[0], Lq, S, key.shape[-1]))
            h = jnp.concatenate([q, k], axis=-1)
            h = MLPModule([self.q_dim + k_dim, *self.mlp_layers],
                          activation_func=self.activation, bias=self.bias,
                          name="mlp")(h)
            w = nn.Dense(1, name="mlp_out")(h).squeeze(-1)       # [B, Lq, S]
        else:  # scaled-dot-product
            w = query @ key.transpose(0, 2, 1)
        w = w / (query.shape[-1] ** 0.5)
        if key_padding_mask is not None:
            fill = -jnp.inf if softmax else 0.0
            w = jnp.where(key_padding_mask[:, None, :], fill, w)
        if softmax:
            w = jax.nn.softmax(w, axis=-1)
        out = w @ value
        if need_weight:
            return out, w
        return out


class TransformerLayer(nn.Module):
    """Post-LN transformer encoder block (torch nn.TransformerEncoderLayer
    semantics, as used by SASRec/BERT4Rec in the reference).

    Owns its parameters directly (fused ``qkv_kernel`` like torch's
    ``in_proj_weight``) so the whole layer can execute as ONE fused Pallas
    program on TPU (ops/transformer_layer.py) — at recsys shapes
    (L ~ 20-50, D = 64-128) the per-op XLA path is dominated by HBM
    round-trips of sub-tile intermediates. The XLA path below is the
    reference semantics and the CPU/backstop implementation.
    """
    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, training: bool = False):
        d, F, H = self.d_model, self.dim_feedforward, self.n_head
        init = nn.initializers.lecun_normal()
        params = {
            "qkv_kernel": self.param("qkv_kernel", init, (d, 3 * d)),
            "qkv_bias": self.param("qkv_bias", nn.initializers.zeros, (3 * d,)),
            "out_kernel": self.param("out_kernel", init, (d, d)),
            "out_bias": self.param("out_bias", nn.initializers.zeros, (d,)),
            "norm1_scale": self.param("norm1_scale", nn.initializers.ones, (d,)),
            "norm1_bias": self.param("norm1_bias", nn.initializers.zeros, (d,)),
            "ffn1_kernel": self.param("ffn1_kernel", init, (d, F)),
            "ffn1_bias": self.param("ffn1_bias", nn.initializers.zeros, (F,)),
            "ffn2_kernel": self.param("ffn2_kernel", init, (F, d)),
            "ffn2_bias": self.param("ffn2_bias", nn.initializers.zeros, (d,)),
            "norm2_scale": self.param("norm2_scale", nn.initializers.ones, (d,)),
            "norm2_bias": self.param("norm2_bias", nn.initializers.zeros, (d,)),
        }
        from ...ops import attention as attn_ops
        from ...ops import transformer_layer as ftl
        B, L, _ = x.shape
        if (attn_ops.supports_pallas()
                and ftl.supports_fused_layer(d, L, H, F, self.activation)
                and (attn_mask is None or attn_mask.ndim == 2)):
            if training and self.dropout > 0:
                bits = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32)
                seed = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            else:
                seed = jnp.int32(0)
            return ftl.fused_transformer_layer(
                x, params, key_padding_mask, attn_mask, H, self.dropout,
                self.activation, float(self.layer_norm_eps), training, seed)
        return self._xla_layer(x, params, key_padding_mask, attn_mask, training)

    def _xla_layer(self, x, params, key_padding_mask, attn_mask, training):
        d, H = self.d_model, self.n_head
        B, L, _ = x.shape
        qkv = x @ params["qkv_kernel"] + params["qkv_bias"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = lambda t: t.reshape(B, L, H, d // H).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        from ...ops import attention as attn_ops
        if (attn_ops.supports_pallas() and not (self.dropout > 0 and training)
                and (attn_mask is None or attn_mask.ndim == 2)):
            # flash/fused attention for the configs the fused LAYER kernel
            # declines (long L, wide d/F): no [B, H, L, L] logits in HBM.
            # Attention-prob dropout keeps the dense path (the kernels don't
            # drop inside the softmax); output/FFN dropout below still apply.
            attn = attn_ops.fused_mha(q, k, v, key_padding_mask, attn_mask) \
                .transpose(0, 2, 1, 3).reshape(B, L, d)
            return self._xla_tail(x, attn, params, training)
        logits = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(d / H)
        neg = jnp.finfo(logits.dtype).min
        if attn_mask is not None:
            m = attn_mask[None, None] if attn_mask.ndim == 2 else attn_mask[:, None]
            logits = jnp.where(m, neg, logits)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], neg, logits)
        w = jax.nn.softmax(logits, axis=-1)
        if self.dropout > 0:
            w = nn.Dropout(self.dropout, deterministic=not training)(w)
        attn = (w @ v).transpose(0, 2, 1, 3).reshape(B, L, d)
        return self._xla_tail(x, attn, params, training)

    def _xla_tail(self, x, attn, params, training):
        attn = attn @ params["out_kernel"] + params["out_bias"]
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        ln = lambda t, s, b: self._ln(t, params[s], params[b])
        x = ln(x + attn, "norm1_scale", "norm1_bias")
        h = x @ params["ffn1_kernel"] + params["ffn1_bias"]
        h = get_act(self.activation)(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        h = h @ params["ffn2_kernel"] + params["ffn2_bias"]
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return ln(x + h, "norm2_scale", "norm2_bias")

    def _ln(self, t, scale, bias):
        mu = t.mean(-1, keepdims=True)
        xc = t - mu
        var = (xc * xc).mean(-1, keepdims=True)
        return xc * jax.lax.rsqrt(var + self.layer_norm_eps) * scale + bias


class TransformerEncoder(nn.Module):
    num_layers: int
    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: str = "gelu"
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, key_padding_mask=None, attn_mask=None, training: bool = False):
        for i in range(self.num_layers):
            x = TransformerLayer(self.d_model, self.n_head, self.dim_feedforward,
                                 self.dropout, self.activation, self.layer_norm_eps,
                                 name=f"layer_{i}")(
                x, key_padding_mask=key_padding_mask, attn_mask=attn_mask,
                training=training)
        return x


class KMaxPoolingLayer(nn.Module):
    k: int = 1
    axis: int = -1

    def __call__(self, x):
        top, _ = jax.lax.top_k(jnp.moveaxis(x, self.axis, -1), self.k)
        return jnp.moveaxis(top, -1, self.axis)


class ResidualLayer(nn.Module):
    module: Any

    def __call__(self, x, *args, **kwargs):
        return x + self.module(x, *args, **kwargs)


class CrossCompressUnit(nn.Module):
    """MKR cross&compress between item and entity embeddings."""
    embed_dim: int

    @nn.compact
    def __call__(self, v, e):
        # v, e: [B, D]
        c = v[:, :, None] * e[:, None, :]            # [B, D, D]
        ct = c.transpose(0, 2, 1)
        d = self.embed_dim
        w_vv = self.param("w_vv", nn.initializers.xavier_normal(), (d, 1))
        w_ev = self.param("w_ev", nn.initializers.xavier_normal(), (d, 1))
        w_ve = self.param("w_ve", nn.initializers.xavier_normal(), (d, 1))
        w_ee = self.param("w_ee", nn.initializers.xavier_normal(), (d, 1))
        b_v = self.param("b_v", nn.initializers.zeros, (d,))
        b_e = self.param("b_e", nn.initializers.zeros, (d,))
        v_out = (c @ w_vv + ct @ w_ev).squeeze(-1) + b_v
        e_out = (c @ w_ve + ct @ w_ee).squeeze(-1) + b_e
        return v_out, e_out


class FeatInterLayers(nn.Module):
    """Stack of identical feature-interaction sublayers."""
    dim: int
    num_layers: int
    module_factory: Callable[[], Any]

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = self.module_factory()(x)
        return x
