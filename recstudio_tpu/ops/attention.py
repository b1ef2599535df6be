"""Fused multi-head attention (Pallas TPU kernel).

``fused_mha(q, k, v, key_padding_mask, attn_mask)`` computes
``softmax(q k^T / sqrt(Dh) + masks) v`` for the transformer encoders of the
seq family (SASRec/BERT4Rec/..., reference recstudio/model/seq/sasrec.py and
module/layers.py MultiheadAttention use). Two regimes, dispatched on Lk:

- short sequences (the recsys norm, max_seq_len 20-50, data/config/all.yaml):
  the whole (Lq, Lk) score tile of one (batch, head) pair lives in VMEM and
  the kernel fuses the two matmuls with the masked softmax, eliminating the
  [B, H, L, L] logits round-trip through HBM that the unfused XLA path
  materializes;
- long sequences (Lk > 512): tiled flash attention — online softmax over KV
  tiles with running max/denominator/accumulator in VMEM scratch, so there
  is no single-tile VMEM cliff at any length (the reference AttentionLayer,
  module/layers.py:322, has no length limit either).

Masks follow torch.nn.MultiheadAttention semantics: boolean, True = disallow,
applied additively with ``finfo.min`` (never -inf, so fully-masked rows stay
finite). The op is differentiable via a custom VJP whose backward recomputes
through the (mathematically identical) XLA reference — exact gradients with
no hand-written backward kernel, cheap at these sequence lengths.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Explicit in-kernel dot precision: Mosaic cannot lower the process-wide
# DotAlgorithmPreset set by train.precision: bf16_3x ('DotAlgorithmPreset'
# object is not subscriptable); DEFAULT rides the MXU bf16 datapath.
_PREC = jax.lax.Precision.DEFAULT


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supports_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# reference implementation (XLA) — also the backward path
# ---------------------------------------------------------------------------
def mha_xla(q: jax.Array, k: jax.Array, v: jax.Array,
            pad_add: Optional[jax.Array], attn_add: Optional[jax.Array]
            ) -> jax.Array:
    """q,k,v: [B, H, L, Dh]; pad_add: [B, Lk] additive; attn_add: [Lq, Lk]."""
    logits = (q @ k.transpose(0, 1, 3, 2)) / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    if attn_add is not None:
        logits = logits + attn_add[None, None]
    if pad_add is not None:
        logits = logits + pad_add[:, None, None, :]
    w = jax.nn.softmax(logits, axis=-1)
    return w @ v


# ---------------------------------------------------------------------------
# kernel: one (batch, head) pair per grid cell, whole L×L tile in VMEM
# ---------------------------------------------------------------------------
def _mha_kernel(q_ref, k_ref, v_ref, pad_ref, attn_ref, out_ref, *, scale):
    q = q_ref[0, 0]                                        # [Lq, Dp]
    k = k_ref[0, 0]                                        # [Lk, Dp]
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=_PREC) * scale
    # add masks, clamped so a fully-masked row stays finite (no 0/0 NaN)
    s = jnp.maximum(s + attn_ref[:] + pad_ref[0],
                    jnp.float32(jnp.finfo(jnp.float32).min))
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = p.sum(axis=-1, keepdims=True)
    out_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32, precision=_PREC) / l


def _mha_pallas(q, k, v, pad_add, attn_add):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    Lqp, Lkp, Dp = _round_up(Lq, 8), _round_up(Lk, 128), _round_up(Dh, 128)
    NEG = float(jnp.finfo(jnp.float32).min)

    qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (0, Lqp - Lq), (0, Dp - Dh)))
    kp = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, 0), (0, Lkp - Lk), (0, Dp - Dh)))
    vp = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, 0), (0, Lkp - Lk), (0, Dp - Dh)))
    if pad_add is None:
        pad_add = jnp.zeros((B, Lk), jnp.float32)
    # padded key columns must never receive attention mass
    padp = jnp.pad(pad_add.astype(jnp.float32), ((0, 0), (0, Lkp - Lk)),
                   constant_values=NEG)[:, None, :]   # [B, 1, Lkp]
    if attn_add is None:
        attn_add = jnp.zeros((Lq, Lk), jnp.float32)
    attnp = jnp.pad(attn_add.astype(jnp.float32),
                    ((0, Lqp - Lq), (0, Lkp - Lk)))

    out = pl.pallas_call(
        partial(_mha_kernel, scale=1.0 / (Dh ** 0.5)),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Lqp, Dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lkp, Dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lkp, Dp), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Lkp), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((Lqp, Lkp), lambda b, h: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, Lqp, Dp), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lqp, Dp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(qp, kp, vp, padp, attnp)
    return out[:, :, :Lq, :Dh].astype(q.dtype)


# ---------------------------------------------------------------------------
# tiled flash attention: online softmax over KV tiles (no single-tile cliff).
# Engaged when the (Lq, Lk) score tile would not fit VMEM comfortably; the
# running max / denominator / accumulator live in VMEM scratch that persists
# across the innermost ("arbitrary") KV grid dimension.
# ---------------------------------------------------------------------------
_FLASH_THRESHOLD = 512   # Lk above which the tiled kernel takes over
_TQ, _TK = 128, 512


def _flash_kernel(q_ref, k_ref, v_ref, pad_ref, attn_ref, out_ref, lse_ref,
                  m_ref, l_ref, acc_ref, *, scale, nk):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, jnp.float32(jnp.finfo(jnp.float32).min))
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                                       # [TQ, Dp]
    k = k_ref[0, 0]                                       # [TK, Dp]
    v = v_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=_PREC) * scale
    s = jnp.maximum(s + attn_ref[:] + pad_ref[0],
                    jnp.float32(jnp.finfo(jnp.float32).min))  # [TQ, TK]

    m_prev = m_ref[:]                                     # [TQ, 128] (lane-bcast)
    l_prev = l_ref[:]
    m_cur = s.max(axis=-1, keepdims=True)                 # [TQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)                    # [TQ, 128]
    corr = jnp.exp(m_prev - m_new)                        # finite: m monotone
    p = jnp.exp(s - m_new[:, :1])                         # [TQ, TK]
    l_new = corr * l_prev + p.sum(axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr[:, :1] + \
        jnp.dot(p, v, preferred_element_type=jnp.float32, precision=_PREC)
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(ki == nk - 1)
    def _finish():
        out_ref[0, 0] = acc_ref[:] / l_ref[:, :1]
        # log-sum-exp per query row (lane-broadcast) — the backward
        # residual that lets the bwd kernels recompute p tile-by-tile
        lse_ref[0, 0] = m_ref[:] + jnp.log(l_ref[:])


def _mha_flash(q, k, v, pad_add, attn_add):
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    TQ, TK = min(_TQ, _round_up(Lq, 8)), min(_TK, _round_up(Lk, 128))
    Lqp, Lkp, Dp = _round_up(Lq, TQ), _round_up(Lk, TK), _round_up(Dh, 128)
    nq, nk = Lqp // TQ, Lkp // TK
    NEG = float(jnp.finfo(jnp.float32).min)

    qp = jnp.pad(q.astype(jnp.float32), ((0, 0), (0, 0), (0, Lqp - Lq), (0, Dp - Dh)))
    kp = jnp.pad(k.astype(jnp.float32), ((0, 0), (0, 0), (0, Lkp - Lk), (0, Dp - Dh)))
    vp = jnp.pad(v.astype(jnp.float32), ((0, 0), (0, 0), (0, Lkp - Lk), (0, Dp - Dh)))
    if pad_add is None:
        pad_add = jnp.zeros((B, Lk), jnp.float32)
    padp = jnp.pad(pad_add.astype(jnp.float32), ((0, 0), (0, Lkp - Lk)),
                   constant_values=NEG)[:, None, :]       # [B, 1, Lkp]
    if attn_add is None:
        attn_add = jnp.zeros((Lq, Lk), jnp.float32)
    attnp = jnp.pad(attn_add.astype(jnp.float32),
                    ((0, Lqp - Lq), (0, Lkp - Lk)))

    out, lse = pl.pallas_call(
        partial(_flash_kernel, scale=1.0 / (Dh ** 0.5), nk=nk),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK), lambda b, h, qi, ki: (b, 0, ki)),
            pl.BlockSpec((TQ, TK), lambda b, h, qi, ki: (qi, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TQ, 128), lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lqp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Lqp, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TQ, 128), jnp.float32),   # running max (lane-bcast)
            pltpu.VMEM((TQ, 128), jnp.float32),   # running denominator
            pltpu.VMEM((TQ, Dp), jnp.float32),    # running accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, padp, attnp)
    return out[:, :, :Lq, :Dh].astype(q.dtype), lse


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, pad_ref, attn_ref, do_ref,
                         o_ref, lse_ref, dq_ref, acc_ref, *, scale, nk):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    do, o = do_ref[0, 0], o_ref[0, 0]
    lse = lse_ref[0, 0]                                    # [TQ, 128]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=_PREC) * scale
    s = jnp.maximum(s + attn_ref[:] + pad_ref[0],
                    jnp.float32(jnp.finfo(jnp.float32).min))
    p = jnp.exp(s - lse[:, :1])                            # [TQ, TK]
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32, precision=_PREC)
    delta = (do * o).sum(axis=-1, keepdims=True)           # [TQ, 1]
    ds = p * (dp - delta)
    acc_ref[:] = acc_ref[:] + \
        jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=_PREC) * scale

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0, 0] = acc_ref[:]


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, pad_ref, attn_ref, do_ref,
                          o_ref, lse_ref, dk_ref, dv_ref,
                          dk_acc, dv_acc, *, scale, nq):
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
    do, o = do_ref[0, 0], o_ref[0, 0]
    lse = lse_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=_PREC) * scale
    s = jnp.maximum(s + attn_ref[:] + pad_ref[0],
                    jnp.float32(jnp.finfo(jnp.float32).min))
    p = jnp.exp(s - lse[:, :1])                            # [TQ, TK]
    dv_acc[:] = dv_acc[:] + jnp.dot(p.T, do,
                                    preferred_element_type=jnp.float32, precision=_PREC)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32, precision=_PREC)
    delta = (do * o).sum(axis=-1, keepdims=True)
    ds = p * (dp - delta)                                  # [TQ, TK]
    dk_acc[:] = dk_acc[:] + \
        jnp.dot(ds.T, q, preferred_element_type=jnp.float32, precision=_PREC) * scale

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[:]
        dv_ref[0, 0] = dv_acc[:]


def _flash_bwd(q, k, v, pad_add, attn_add, o, lse_p, g):
    """Tiled flash backward: dq accumulated over KV tiles, dk/dv over Q
    tiles — the [B, H, Lq, Lk] logits are never materialized (the v1
    backward recomputed through the unfused XLA path, which at Lk>512 was
    exactly the HBM blow-up the forward kernel exists to avoid)."""
    B, H, Lq, Dh = q.shape
    Lk = k.shape[2]
    TQ, TK = min(_TQ, _round_up(Lq, 8)), min(_TK, _round_up(Lk, 128))
    Lqp, Lkp, Dp = _round_up(Lq, TQ), _round_up(Lk, TK), _round_up(Dh, 128)
    nq, nk = Lqp // TQ, Lkp // TK
    NEG = float(jnp.finfo(jnp.float32).min)
    scale = 1.0 / (Dh ** 0.5)

    f32 = jnp.float32
    qp = jnp.pad(q.astype(f32), ((0, 0), (0, 0), (0, Lqp - Lq), (0, Dp - Dh)))
    kp = jnp.pad(k.astype(f32), ((0, 0), (0, 0), (0, Lkp - Lk), (0, Dp - Dh)))
    vp = jnp.pad(v.astype(f32), ((0, 0), (0, 0), (0, Lkp - Lk), (0, Dp - Dh)))
    dop = jnp.pad(g.astype(f32), ((0, 0), (0, 0), (0, Lqp - Lq), (0, Dp - Dh)))
    op = jnp.pad(o.astype(f32), ((0, 0), (0, 0), (0, Lqp - Lq), (0, Dp - Dh)))
    if pad_add is None:
        pad_add = jnp.zeros((B, Lk), f32)
    padp = jnp.pad(pad_add.astype(f32), ((0, 0), (0, Lkp - Lk)),
                   constant_values=NEG)[:, None, :]
    if attn_add is None:
        attn_add = jnp.zeros((Lq, Lk), f32)
    attnp = jnp.pad(attn_add.astype(f32), ((0, Lqp - Lq), (0, Lkp - Lk)))

    dq = pl.pallas_call(
        partial(_flash_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(B, H, nq, nk),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK), lambda b, h, qi, ki: (b, 0, ki)),
            pl.BlockSpec((TQ, TK), lambda b, h, qi, ki: (qi, ki)),
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TQ, 128), lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lqp, Dp), f32),
        scratch_shapes=[pltpu.VMEM((TQ, Dp), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, padp, attnp, dop, op, lse_p)

    dk, dv = pl.pallas_call(
        partial(_flash_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(B, H, nk, nq),
        in_specs=[
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK), lambda b, h, ki, qi: (b, 0, ki)),
            pl.BlockSpec((TQ, TK), lambda b, h, ki, qi: (qi, ki)),
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TQ, Dp), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, TQ, 128), lambda b, h, ki, qi: (b, h, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, TK, Dp), lambda b, h, ki, qi: (b, h, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Lkp, Dp), f32),
            jax.ShapeDtypeStruct((B, H, Lkp, Dp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((TK, Dp), f32), pltpu.VMEM((TK, Dp), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, padp, attnp, dop, op, lse_p)

    return (dq[:, :, :Lq, :Dh].astype(q.dtype),
            dk[:, :, :Lk, :Dh].astype(k.dtype),
            dv[:, :, :Lk, :Dh].astype(v.dtype))


def _dispatch(q, k, v, pad_add, attn_add):
    if k.shape[2] > _FLASH_THRESHOLD:
        return _mha_flash(q, k, v, pad_add, attn_add)[0]
    return _mha_pallas(q, k, v, pad_add, attn_add)


# ---------------------------------------------------------------------------
# public op with custom VJP: flash regime gets a tiled flash backward (no
# [B, H, Lq, Lk] logits anywhere); the short regime recomputes through the
# XLA reference, which is exact and cheap at Lk <= 512
# ---------------------------------------------------------------------------
@jax.custom_vjp
def _fused_mha_core(q, k, v, pad_add, attn_add):
    return _dispatch(q, k, v, pad_add, attn_add)


def _fwd(q, k, v, pad_add, attn_add):
    if k.shape[2] > _FLASH_THRESHOLD:
        out, lse = _mha_flash(q, k, v, pad_add, attn_add)
        return out, (q, k, v, pad_add, attn_add, out, lse)
    return _mha_pallas(q, k, v, pad_add, attn_add), \
        (q, k, v, pad_add, attn_add, None, None)


def _bwd(res, g):
    q, k, v, pad_add, attn_add, o, lse = res
    if lse is not None:
        dq, dk, dv = _flash_bwd(q, k, v, pad_add, attn_add, o, lse, g)
        return dq, dk, dv, None, None
    _, vjp = jax.vjp(lambda q_, k_, v_: mha_xla(q_, k_, v_, pad_add, attn_add),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_fused_mha_core.defvjp(_fwd, _bwd)


def fused_mha(q: jax.Array, k: jax.Array, v: jax.Array,
              key_padding_mask: Optional[jax.Array] = None,
              attn_mask: Optional[jax.Array] = None) -> jax.Array:
    """Fused softmax attention.

    q, k, v: ``[B, H, L, Dh]``. ``key_padding_mask``: bool ``[B, Lk]``
    (True = pad). ``attn_mask``: bool ``[Lq, Lk]`` (True = disallow, e.g.
    the causal triu mask). Returns ``[B, H, Lq, Dh]``.
    """
    neg = jnp.finfo(jnp.float32).min
    pad_add = None if key_padding_mask is None else \
        jnp.where(key_padding_mask, neg, 0.0).astype(jnp.float32)
    attn_add = None if attn_mask is None else \
        jnp.where(attn_mask, neg, 0.0).astype(jnp.float32)
    return _fused_mha_core(q, k, v, pad_add, attn_add)
