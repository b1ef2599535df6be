"""Fused post-LN transformer layer: one Pallas program per tile of examples.

Why: the recsys sequence regime (L ~ 20-50, D = 64-128, reference
``AttentionLayer``/torch ``TransformerEncoderLayer`` at
recstudio/model/module/layers.py:322 and seq/sasrec.py:8-67) is hostile to
per-op execution. A SASRec training step is ~100 XLA kernels over sub-tile
tensors ([B*L, 64] pads half the 128-lane VREG, [B, H, 20, 20] logits pad
6x), so HBM round-trips and launch overhead dominate — the actual MXU work
is ~100 us. This kernel runs the ENTIRE layer in VMEM per tile of ``TB``
examples:

    qkv = x @ Wqkv + b                      (fused projection)
    per head: S = Q K^T / sqrt(Dh) + mask ; P = drop(softmax(S)) ; A = P V
    o  = drop(A @ Wo + bo)
    x1 = LN1(x + o)
    h  = drop(act(x1 @ W1 + b1))
    f  = drop(h @ W2 + b2)
    out = LN2(x1 + f)

reading ``x`` once from HBM and writing ``out`` once. All four dropout
sites use the on-core PRNG (`pltpu.prng_seed` / `prng_random_bits`); the
backward kernel re-seeds identically and regenerates the same masks, so no
mask is ever materialized in HBM. The backward is a second fused kernel
that recomputes the forward in VMEM (flash-style: the only residual is
``x`` itself) and accumulates all 12 weight/bias/LN gradients across the
sequential grid.

Packed cross-example attention, in GROUPS: per-example L x L attention
matrices are far below the 128x128 MXU tile, so the kernel packs G examples
per attention group — S = Q_g @ K_g^T over [Lg=G*L, Dh] with a
block-diagonal additive mask (built once by the wrapper, identical for
every group since group boundaries align with examples). G is chosen so Lg
rides one-or-few MXU tiles: packing the whole example tile (G=TB, the old
scheme) wastes O(TB) FLOPs on masked-out cross-example blocks — at M=320,
L=20 the packed scores were 16x redundant and attention dominated the
layer; grouped at Lg~120 the waste is 6x on a 4x smaller matrix, and the
per-head P/dropout residuals shrink from M*M to M*Lg, freeing VMEM for
larger example tiles.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(jnp.finfo(jnp.float32).min)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _mm_bf16_default() -> bool:
    """Honor ``train.precision: bf16`` (recommender.py sets
    jax_default_matmul_precision) inside the kernels too, for semantic
    consistency with the XLA path. Measured NON-lever on v5e at both L=20
    (overhead-bound) and L=200/d=128 (12.7 ms/step f32 vs 13.3 ms with
    casts, scripts/ftl_bench.py): precision=DEFAULT dots already ride the
    MXU's one-pass bf16 datapath for f32 operands, so the explicit casts
    only add VPU work. Kept because a user asking for bf16 should get bf16
    numerics (parity-tested in tests/test_ops.py)."""
    return str(jax.config.jax_default_matmul_precision).lower() in (
        "bfloat16", "bf16")


def _dot(a: jax.Array, b: jax.Array, mm_bf16: bool) -> jax.Array:
    """MXU matmul with f32 accumulation; optionally one-pass bf16 inputs.

    ``precision`` is EXPLICIT: without it the dot inherits the process-wide
    ``jax_default_matmul_precision``, and when that is a DotAlgorithmPreset
    (train.precision: bf16_3x) Mosaic's lowering crashes
    ("'DotAlgorithmPreset' object is not subscriptable"). Inside the kernel
    DEFAULT already rides the MXU one-pass bf16 datapath for f32 operands."""
    if mm_bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def supports_fused_layer(d_model: int, seq_len: int, n_head: int,
                         dim_feedforward: int, activation: str) -> bool:
    import os
    if os.environ.get("RECSTUDIO_NO_FUSED_TL"):  # A/B: force the XLA path
        return False
    if d_model % n_head:
        return False
    if activation not in ("gelu", "relu"):
        return False
    return d_model <= 256 and dim_feedforward <= 1024 and seq_len <= 256


def _choose_tiles(L: int, D: int = 64, F: int = 128, H: int = 2):
    """(TB, G): examples per grid cell and examples per attention group.

    Picks the pair minimizing an MXU tick model (each 128^3 matmul pass is
    one tick; a fixed per-cell overhead charge favors larger example tiles)
    under a VMEM budget for the recompute backward's residuals. Constraints:
    G | TB (groups hold whole examples) and (G*L) % 8 == 0 (sublane-aligned
    slices). Override with RECSTUDIO_FTL_TILES="TB,G" for sweeps. Measured
    on v5e at SASRec shapes (L=20, D=64, F=128, H=2): grouped Lg=120 tiles
    beat the full-pack M=320 scheme (see module docstring).
    """
    import os
    override = os.environ.get("RECSTUDIO_FTL_TILES")
    if override:
        tb, g = (int(v) for v in override.split(","))
        return tb, g

    Dh = max(1, D // H)
    t = lambda n: -(-n // 128)  # ceil to MXU tiles

    def ticks(M: int, Lg: int) -> float:
        att = (M // Lg) * t(Lg) * t(Lg) * t(Dh) * 2 * H        # QK^T + PV
        proj = t(M) * (t(3 * D) + t(D) + t(F) + t(D)) * t(D)   # qkv/o/ffn
        return att + proj + 12.0                               # per-cell cost

    def vmem_bytes(M: int, Lg: int) -> int:
        # f32 live in the backward: [Lg, Lg] mask, per-head P + keep
        # residuals (M*Lg each), x/qkv/x1/hpre/hact/hd/f activations
        return 4 * (Lg * Lg + 2 * H * M * Lg + M * (3 * D + F) * 4)

    best = None   # (cost_per_example, M, TB, G)
    for TB in range(1, 65):
        M = TB * L
        # M capped at max(512, 4L): measured on v5e at L=20, M=480 beats
        # 960/640 even though the tick model scores them equal — smaller
        # per-cell working sets pipeline better across grid cells. But at
        # long L the cap must scale or it forces tiny TB: at L=200/D=128
        # (B=1024) TB=4 (M=800) measures 11.4 ms/step vs 12.7 at TB=2
        # (M=400 pads 28% of every projection's row tiles); TB>=5 fails
        # VMEM, which the budget below correctly predicts.
        if M % 8 or M > max(512, 4 * L):
            continue
        for G in range(1, TB + 1):
            Lg = G * L
            if TB % G or Lg % 8 or Lg > 512:
                continue
            if vmem_bytes(M, Lg) > 10 * 2 ** 20:
                continue
            key = (ticks(M, Lg) / TB, M)
            if best is None or key < best[:2]:
                best = (*key, TB, G)
    if best is not None:
        return best[2], best[3]
    TB = max(1, -(-128 // L))   # fallback: minimal rule, full pack
    while (TB * L) % 8:
        TB += 1
    return TB, TB


class _DropRng:
    """Deterministic dropout-mask stream, regenerated identically by the
    forward and backward kernels (call order defines the stream). On TPU it
    is the on-core PRNG (`pltpu.prng_seed`/`prng_random_bits`); in interpret
    mode (CPU tests) those primitives don't lower, so a threefry stream
    keyed on the same seed stands in."""

    def __init__(self, seed_scalar):
        self.interpret = _interpret()
        if self.interpret:
            self.key = jax.random.PRNGKey(seed_scalar)
            self.n = 0
        else:
            pltpu.prng_seed(seed_scalar)

    def keep(self, shape, p: float) -> jax.Array:
        if self.interpret:
            self.n += 1
            u = jax.random.uniform(jax.random.fold_in(self.key, self.n), shape)
            return (u >= p).astype(jnp.float32) * (1.0 / (1.0 - p))
        # integer-domain compare: bits >= p*2^24 over the high 24 bits is
        # exactly (u >= p) for u = bits>>8 / 2^24, without the int->f32
        # convert + scale per element (the kernel is VPU-bound; dropout
        # masks are its largest elementwise term)
        bits = pltpu.prng_random_bits(shape) >> 8                   # 24 bits
        thr = jnp.uint32(min(math.ceil(p * (1 << 24)), (1 << 24) - 1))
        return jnp.where(bits >= thr, jnp.float32(1.0 / (1.0 - p)),
                         jnp.float32(0.0))


def _act_fn(name: str):
    return jax.nn.gelu if name == "gelu" else lambda x: jnp.maximum(x, 0.0)


def _act_grad(name: str, pre: jax.Array) -> jax.Array:
    if name == "relu":
        return (pre > 0).astype(jnp.float32)
    # tanh-approximate gelu derivative (matches jax.nn.gelu default)
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    inner = c * (pre + a * pre ** 3)
    t = jnp.tanh(inner)
    return 0.5 * (1.0 + t) + 0.5 * pre * (1.0 - t * t) * c * (1.0 + 3.0 * a * pre ** 2)


def _ln_fwd(x, scale, bias, eps):
    mu = x.mean(-1, keepdims=True)
    xc = x - mu
    var = (xc * xc).mean(-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = xc * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dy, xhat, inv, scale):
    """Grad wrt the LN input given upstream dy (per-row normalization)."""
    dxhat = dy * scale
    m1 = dxhat.mean(-1, keepdims=True)
    m2 = (dxhat * xhat).mean(-1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2)


def _cell_rng(seed_ref, p, training):
    if not (training and p > 0):
        return None
    # distinct stream per grid cell; identical in fwd and bwd
    return _DropRng(seed_ref[0, 0] + pl.program_id(0) * jnp.int32(-1640531527))


def _attention(qkv, mask, padrow, D, H, Lg, p, training, rng=None,
               mm=False):
    """Grouped packed per-head attention over [Lg, Lg] score blocks.

    ``mask`` is the [Lg, Lg] additive block-diagonal (+ user) mask shared by
    every group; ``padrow`` the [n_g*8, Lg] additive key-padding rows for
    the cell — group g's row lives at sublane 8*g (8x-replicated so the
    kernel slices on an aligned sublane boundary; a lane-dim slice of a
    [1, M] row at offset g*Lg is not Mosaic-lowerable when Lg % 128 != 0).
    Returns (A [M, D], residuals keyed (head, group))."""
    M = qkv.shape[0]
    Dh = D // H
    scale = 1.0 / (Dh ** 0.5)
    # hoist the combined additive mask per group (shared by all H heads —
    # saves one [Lg, Lg] add pass per head beyond the first)
    gmask = [mask + padrow[8 * g:8 * g + 1, :] for g in range(M // Lg)]
    heads, resid = [], []
    for h in range(H):
        q = qkv[:, h * Dh:(h + 1) * Dh]
        k = qkv[:, D + h * Dh:D + (h + 1) * Dh]
        v = qkv[:, 2 * D + h * Dh:2 * D + (h + 1) * Dh]
        rows, hres = [], []
        for g in range(M // Lg):
            sl = slice(g * Lg, (g + 1) * Lg)
            s = _dot(q[sl], k[sl].T, mm) * scale
            s = jnp.maximum(s + gmask[g], NEG)
            m = s.max(-1, keepdims=True)
            e = jnp.exp(s - m)
            # reciprocal [Lg, 1] + broadcast multiply instead of a full
            # [Lg, Lg] divide pass (VPU divides are multi-op)
            P = e * (1.0 / e.sum(-1, keepdims=True))
            keep = rng.keep(P.shape, p) if rng is not None else None
            Pd = P * keep if keep is not None else P
            rows.append(_dot(Pd, v[sl], mm))
            hres.append((P, keep))
        heads.append(jnp.concatenate(rows, axis=0) if len(rows) > 1
                     else rows[0])
        resid.append((q, k, v, hres))
    return jnp.concatenate(heads, axis=-1), resid


def _fwd_kernel(seed_ref, x_ref, mask_ref, padrow_ref,
                wqkv_ref, bqkv_ref, wo_ref, bo_ref, n1s_ref, n1b_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, n2s_ref, n2b_ref,
                out_ref, *, H, Lg, p, training, act, eps, mm):
    rng = _cell_rng(seed_ref, p, training)
    x = x_ref[:].astype(jnp.float32)                       # [M, D]
    D = x.shape[-1]
    qkv = _dot(x, wqkv_ref[:], mm) + bqkv_ref[:]
    A, _ = _attention(qkv, mask_ref[:], padrow_ref[0], D, H, Lg, p,
                      training, rng, mm)
    o = _dot(A, wo_ref[:], mm) + bo_ref[:]
    if training and p > 0:
        o = o * rng.keep(o.shape, p)
    x1, _, _ = _ln_fwd(x + o, n1s_ref[:], n1b_ref[:], eps)
    hpre = _dot(x1, w1_ref[:], mm) + b1_ref[:]
    hact = _act_fn(act)(hpre)
    if training and p > 0:
        hact = hact * rng.keep(hact.shape, p)
    f = _dot(hact, w2_ref[:], mm) + b2_ref[:]
    if training and p > 0:
        f = f * rng.keep(f.shape, p)
    out, _, _ = _ln_fwd(x1 + f, n2s_ref[:], n2b_ref[:], eps)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, mask_ref, padrow_ref,
                wqkv_ref, bqkv_ref, wo_ref, bo_ref, n1s_ref, n1b_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, n2s_ref, n2b_ref, g_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                dn1s_ref, dn1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dn2s_ref, dn2b_ref, *, H, Lg, p, training, act, eps, mm):
    rng = _cell_rng(seed_ref, p, training)
    x = x_ref[:].astype(jnp.float32)
    D = x.shape[-1]
    drop = training and p > 0

    # ---- recompute forward (same PRNG stream order as _fwd_kernel) ----
    qkv = _dot(x, wqkv_ref[:], mm) + bqkv_ref[:]
    A, resid = _attention(qkv, mask_ref[:], padrow_ref[0], D, H, Lg, p,
                          training, rng, mm)
    o_pre = _dot(A, wo_ref[:], mm) + bo_ref[:]
    keep_o = rng.keep(o_pre.shape, p) if drop else None
    o = o_pre * keep_o if drop else o_pre
    x1, xhat1, inv1 = _ln_fwd(x + o, n1s_ref[:], n1b_ref[:], eps)
    hpre = _dot(x1, w1_ref[:], mm) + b1_ref[:]
    hact = _act_fn(act)(hpre)
    keep_h = rng.keep(hact.shape, p) if drop else None
    hd = hact * keep_h if drop else hact
    f_pre = _dot(hd, w2_ref[:], mm) + b2_ref[:]
    keep_f = rng.keep(f_pre.shape, p) if drop else None
    f = f_pre * keep_f if drop else f_pre
    _, xhat2, inv2 = _ln_fwd(x1 + f, n2s_ref[:], n2b_ref[:], eps)

    # ---- backward chain ----
    g = g_ref[:].astype(jnp.float32)
    dn2s = jnp.sum(g * xhat2, 0, keepdims=True)
    dn2b = jnp.sum(g, 0, keepdims=True)
    dr2 = _ln_bwd(g, xhat2, inv2, n2s_ref[:])
    dx1 = dr2
    df = dr2 * keep_f if drop else dr2
    dw2 = _dot(hd.T, df, mm)
    db2 = jnp.sum(df, 0, keepdims=True)
    dhd = _dot(df, w2_ref[:].T, mm)
    dhact = dhd * keep_h if drop else dhd
    dhpre = dhact * _act_grad(act, hpre)
    dw1 = _dot(x1.T, dhpre, mm)
    db1 = jnp.sum(dhpre, 0, keepdims=True)
    dx1 = dx1 + _dot(dhpre, w1_ref[:].T, mm)
    dn1s = jnp.sum(dx1 * xhat1, 0, keepdims=True)
    dn1b = jnp.sum(dx1, 0, keepdims=True)
    dr1 = _ln_bwd(dx1, xhat1, inv1, n1s_ref[:])
    do = dr1 * keep_o if drop else dr1
    dwo = _dot(A.T, do, mm)
    dbo = jnp.sum(do, 0, keepdims=True)
    dA = _dot(do, wo_ref[:].T, mm)

    M = x.shape[0]
    Dh = D // H
    scale = 1.0 / (Dh ** 0.5)
    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(H):
        q, k, v, hres = resid[h]
        dAh = dA[:, h * Dh:(h + 1) * Dh]
        dq_rows, dk_rows, dv_rows = [], [], []
        for g in range(M // Lg):
            sl = slice(g * Lg, (g + 1) * Lg)
            P, keep = hres[g]
            dAg = dAh[sl]
            Pd = P * keep if keep is not None else P
            dv_rows.append(_dot(Pd.T, dAg, mm))
            dP = _dot(dAg, v[sl].T, mm)
            if keep is not None:
                dP = dP * keep
            dS = P * (dP - jnp.sum(dP * P, -1, keepdims=True))
            dq_rows.append(_dot(dS, k[sl], mm) * scale)
            dk_rows.append(_dot(dS.T, q[sl], mm) * scale)
        cat = (lambda rows: jnp.concatenate(rows, axis=0)
               if len(rows) > 1 else rows[0])
        dq_heads.append(cat(dq_rows))
        dk_heads.append(cat(dk_rows))
        dv_heads.append(cat(dv_rows))
    dqkv = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=-1)
    dwqkv = _dot(x.T, dqkv, mm)
    dbqkv = jnp.sum(dqkv, 0, keepdims=True)
    dx = dr1 + _dot(dqkv, wqkv_ref[:].T, mm)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # ---- accumulate weight grads across the sequential grid ----
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, dn1s_ref, dn1b_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref, dn2s_ref, dn2b_ref):
            ref[:] = jnp.zeros_like(ref)

    for ref, val in ((dwqkv_ref, dwqkv), (dbqkv_ref, dbqkv), (dwo_ref, dwo),
                     (dbo_ref, dbo), (dn1s_ref, dn1s), (dn1b_ref, dn1b),
                     (dw1_ref, dw1), (db1_ref, db1), (dw2_ref, dw2),
                     (db2_ref, db2), (dn2s_ref, dn2s), (dn2b_ref, dn2b)):
        ref[:] = ref[:] + val


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda c: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=32)
def _make_fused_layer(TB: int, G: int, L: int, D: int, F: int, H: int,
                      p: float, training: bool, act: str, eps: float,
                      mm: bool):
    """Build the custom-VJP fused layer for one static config."""
    M = TB * L
    Lg = G * L

    def weight_specs():
        return [_full_spec((D, 3 * D)), _full_spec((1, 3 * D)),
                _full_spec((D, D)), _full_spec((1, D)),
                _full_spec((1, D)), _full_spec((1, D)),
                _full_spec((D, F)), _full_spec((1, F)),
                _full_spec((F, D)), _full_spec((1, D)),
                _full_spec((1, D)), _full_spec((1, D))]

    n_g = M // Lg

    def data_specs():
        # padrow is [n_cells, n_g*8, Lg] (see _attention): the grid
        # dimension must not be one of the last two block dims
        return [pl.BlockSpec((1, 1), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((M, D), lambda c: (c, 0), memory_space=pltpu.VMEM),
                _full_spec((Lg, Lg)),
                pl.BlockSpec((1, n_g * 8, Lg), lambda c: (c, 0, 0),
                             memory_space=pltpu.VMEM)]

    kern_kw = dict(H=H, Lg=Lg, p=p, training=training, act=act, eps=eps,
                   mm=mm)

    def fwd(seed, x, mask, padrow, *w):
        n_cells = x.shape[0] // M
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kern_kw),
            grid=(n_cells,),
            in_specs=data_specs() + weight_specs(),
            out_specs=pl.BlockSpec((M, D), lambda c: (c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
            interpret=_interpret(),
        )(seed, x, mask, padrow, *w)

    def bwd_call(seed, x, mask, padrow, w, g):
        n_cells = x.shape[0] // M
        w_shapes = [(D, 3 * D), (1, 3 * D), (D, D), (1, D), (1, D), (1, D),
                    (D, F), (1, F), (F, D), (1, D), (1, D), (1, D)]
        out_shapes = [jax.ShapeDtypeStruct(x.shape, x.dtype)] + \
            [jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes]
        out_specs = [pl.BlockSpec((M, D), lambda c: (c, 0),
                                  memory_space=pltpu.VMEM)] + \
            [_full_spec(s) for s in w_shapes]
        return pl.pallas_call(
            functools.partial(_bwd_kernel, **kern_kw),
            grid=(n_cells,),
            in_specs=data_specs() + weight_specs() + [
                pl.BlockSpec((M, D), lambda c: (c, 0),
                             memory_space=pltpu.VMEM)],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_interpret(),
        )(seed, x, mask, padrow, *w, g)

    @jax.custom_vjp
    def layer(seed, x, mask, padrow, *w):
        return fwd(seed, x, mask, padrow, *w)

    def layer_fwd(seed, x, mask, padrow, *w):
        return fwd(seed, x, mask, padrow, *w), (seed, x, mask, padrow, w)

    def layer_bwd(res, g):
        seed, x, mask, padrow, w = res
        outs = bwd_call(seed, x, mask, padrow, w, g)
        dx, dw = outs[0], outs[1:]
        return (None, dx, None, None,
                *[d.astype(jnp.asarray(wi).dtype) for d, wi in zip(dw, w)])

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_transformer_layer(
        x: jax.Array,                       # [B, L, D]
        params: dict,                       # flat param dict (see TransformerLayer)
        key_padding_mask: Optional[jax.Array],  # bool [B, L], True = pad
        attn_mask: Optional[jax.Array],     # bool [L, L], True = disallow
        n_head: int, dropout: float, activation: str, layer_norm_eps: float,
        training: bool, seed: jax.Array) -> jax.Array:
    """Apply the fused layer to a [B, L, D] batch (pads B to the tile)."""
    B, L, D = x.shape
    F = params["ffn1_kernel"].shape[-1]
    TB, G = _choose_tiles(L, D, F, n_head)
    M = TB * L
    Lg = G * L
    Bp = -(-B // TB) * TB
    n_cells = Bp // TB

    xf = x.reshape(B * L, D)
    if Bp != B:
        xf = jnp.pad(xf, ((0, (Bp - B) * L), (0, 0)))

    # block-diagonal (cross-example) + user attention mask, [Lg, Lg]
    # additive — identical for every attention group (G whole examples)
    ex = jnp.arange(Lg) // L
    same = ex[:, None] == ex[None, :]
    if attn_mask is not None:
        tiled = jnp.tile(jnp.where(attn_mask, NEG, 0.0).astype(jnp.float32),
                         (G, G))
    else:
        tiled = jnp.zeros((Lg, Lg), jnp.float32)
    mask = jnp.where(same, tiled, NEG)

    # per-cell, per-group key-padding rows [n_cells, n_g*8, Lg]
    # (group g replicated at sublanes 8g..8g+7 — see _attention)
    n_g = M // Lg
    if key_padding_mask is not None:
        pad = jnp.where(key_padding_mask, NEG, 0.0).astype(jnp.float32)
        if Bp != B:
            pad = jnp.pad(pad, ((0, Bp - B), (0, 0)))
        padrow = jnp.repeat(pad.reshape(n_cells, n_g, Lg), 8, axis=1)
    else:
        padrow = jnp.zeros((n_cells, n_g * 8, Lg), jnp.float32)

    w = (params["qkv_kernel"], params["qkv_bias"].reshape(1, -1),
         params["out_kernel"], params["out_bias"].reshape(1, -1),
         params["norm1_scale"].reshape(1, -1), params["norm1_bias"].reshape(1, -1),
         params["ffn1_kernel"], params["ffn1_bias"].reshape(1, -1),
         params["ffn2_kernel"], params["ffn2_bias"].reshape(1, -1),
         params["norm2_scale"].reshape(1, -1), params["norm2_bias"].reshape(1, -1))

    layer = _make_fused_layer(TB, G, L, D, F, n_head, float(dropout),
                              bool(training), activation,
                              float(layer_norm_eps), _mm_bf16_default())
    seed2d = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    out = layer(seed2d, xf, mask, padrow, *w)
    return out[:B * L].reshape(B, L, D)
