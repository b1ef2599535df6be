"""CTR feature-embedding machinery and interaction blocks (flax).

Re-implements the reference toolkit (recstudio/model/module/ctr.py): the
``Embeddings`` feature embedder (token / token_seq / float fields with
optional shared dense embedding), first-order ``LinearLayer``, and the
interaction blocks powering the fm zoo (FMLayer:205, CrossNetwork:245/V2:262,
CIN:446, AFMLayer:512, InnerProduct/OuterProductLayer:926/945,
SelfAttentionInteractingLayer:564, ...). Field metadata is carried as a static
tuple of (name, type, vocab_size) so modules stay hashable for jit.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import MLPModule, MultiHeadAttention, get_act

FieldSpecTuple = Tuple[str, str, int]  # (name, type, num_values)


def make_field_specs(fields, data) -> Tuple[FieldSpecTuple, ...]:
    """Build the static field-spec tuple for Embeddings from a dataset."""
    ratings = data.frating if isinstance(data.frating, list) else [data.frating]
    out = []
    for f in sorted(fields):
        if f in ratings or f is None:
            continue
        t = data.field2type.get(f)
        if t is None or t == "str":
            continue
        n = data.num_values(f) if t.startswith("token") else 1
        out.append((f, t, n))
    return tuple(out)


class DenseEmbedding(nn.Module):
    """float scalar -> embed_dim vector (Linear(1, D))."""
    embed_dim: int
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.embed_dim, use_bias=self.bias, name="weight")(
            x[..., None].astype(jnp.float32))


# vocab cutoff for the one-hot-matmul gradient: [B, V] selection matrices
# stay small enough to fuse, and 8192x1024 one-hot x [B, D] dots are MXU
# noise next to the alternatives
_ONEHOT_VOCAB_MAX = 1024

# Discovery hook for the row-sparse CTR optimizer (baseranker.py
# ``_ctr_sparse_grad_step``): while BaseRanker._init_variables traces the
# net, Embeddings instances register their fused-token-table layout here
# (trace-time Python side effect; never read inside compiled code). At
# train-step time the engine injects ``batch["__emb_probes__"][key]`` —
# a zeros [B, T, D] probe differentiated INSTEAD of the table, so the
# dense [N, D] cotangent is never materialized.
_PROBE_DISCOVERY = None  # Optional[dict]: path-key -> layout metadata

# When True at INIT time (set by BaseRanker before net.init when the
# config qualifies for the row-sparse optimizer), the fused token table is
# declared PACKED: [N, 3D] = (params | mu | nu) with zero moments, so the
# optimizer can apply ONE row scatter per step instead of three (TPU
# scatter cost is per-row, width-free below 128 lanes — models/optim.py
# fused_table_lazy_adam_packed). At APPLY time packed-ness is derived from
# the stored leaf's shape, never from this global, so eval/serving of a
# packed checkpoint works regardless of flag state.
_PACKED_MOMENTS = False


def _packed_table_init(n: int, d: int):
    def init(key):
        w = nn.initializers.normal(0.02)(key, (n, d))
        return jnp.concatenate([w, jnp.zeros((n, 2 * d), w.dtype)], axis=-1)
    return init


def _fused_gather_impl(sizes: tuple, table, ids):
    """Gather [..., T] per-field offset ids from the concatenated [N, D]
    token table, with a sort-free, (mostly) scatter-free backward.

    The naive autodiff backward — one scatter-add of B*T cotangent rows
    into [N, D] — serializes on TPU at ~45 ns per update (criteo shape:
    213k updates = ~9.5 ms, 80% of the whole DeepFM step), and every
    sort-then-segment-sum reformulation just moves the time into the sort
    (~18 ms for argsort of 213k inside the epoch scan). This backward uses
    the structure the fusion itself created instead: each field's ids live
    in its own offset slab, so
      - small-vocab fields (V <= _ONEHOT_VOCAB_MAX) reduce EXACTLY via a
        one-hot matmul (onehot[B, V].T @ ct[B, D] on the MXU, full-f32
        passes), no sort, no scatter;
      - the few big-vocab fields share ONE scatter-add over just their
        B-per-field updates.
    The slab results concatenate into d_table in offset order. (A tiled
    sort-then-matmul segment sum was also tried: at D>=64 the one-hot
    matmul's R-times FLOP overhead loses to the plain scatter, and the
    in-scan argsort itself costs more than the scatter it avoids.)

    The FORWARD is split the same way: small-vocab fields read their rows
    via an exact one-hot matmul (onehot[B, V] @ slab[V, D]; each product is
    1.0 * value at full-f32 precision, so results are bit-identical to the
    gather) and only big-vocab fields pay random HBM reads — at criteo
    shape that cuts the random-access volume from 26 B-sized gathers to 7.
    """
    D = table.shape[-1]
    lead = ids.shape[:-1]
    ids2 = ids.reshape(-1, ids.shape[-1])
    B = ids2.shape[0]
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    outs = [None] * len(sizes)
    big = [t for t, v in enumerate(sizes) if v > _ONEHOT_VOCAB_MAX]
    for t, v in enumerate(sizes):
        if v > _ONEHOT_VOCAB_MAX:
            continue
        slab = jax.lax.slice_in_dim(table, int(offs[t]), int(offs[t]) + v)
        rel = ids2[:, t] - int(offs[t])
        onehot = (rel[:, None] == jnp.arange(v, dtype=rel.dtype)[None, :])
        outs[t] = jnp.dot(onehot.astype(table.dtype), slab,
                          preferred_element_type=table.dtype,
                          precision=jax.lax.Precision.HIGHEST)
    if big:
        gathered = table.at[ids2[:, big]].get(
            mode="promise_in_bounds")               # [B, n_big, D]
        for k, t in enumerate(big):
            outs[t] = gathered[:, k, :]
    return jnp.stack(outs, axis=1).reshape(*lead, len(sizes), D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_gather(sizes: tuple, table, ids):
    return _fused_gather_impl(sizes, table, ids)


def _fused_gather_fwd(sizes, table, ids):
    return _fused_gather_impl(sizes, table, ids), ids


def _fused_gather_bwd(sizes, ids, ct):
    D = ct.shape[-1]
    ids2 = ids.reshape(-1, ids.shape[-1])          # [B, T]
    ct2 = ct.reshape(-1, ids.shape[-1], D)         # [B, T, D]
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    slabs = [None] * len(sizes)
    big = [t for t, v in enumerate(sizes) if v > _ONEHOT_VOCAB_MAX]
    for t, v in enumerate(sizes):
        if v > _ONEHOT_VOCAB_MAX:
            continue
        rel = ids2[:, t] - int(offs[t])            # [B] in [0, v)
        onehot = (rel[None, :] == jnp.arange(v, dtype=rel.dtype)[:, None])
        slabs[t] = jnp.dot(onehot.astype(ct.dtype), ct2[:, t, :],
                           preferred_element_type=ct.dtype,
                           precision=jax.lax.Precision.HIGHEST)
    if big:
        n_big = int(sum(sizes[t] for t in big))
        big_off = {}
        acc = 0
        for t in big:
            big_off[t] = acc
            acc += sizes[t]
        bids = jnp.concatenate(
            [ids2[:, t] - int(offs[t]) + big_off[t] for t in big])
        bct = jnp.concatenate([ct2[:, t, :] for t in big])
        d_big = jnp.zeros((n_big, D), ct.dtype).at[bids].add(bct)
        pos = 0
        for t in big:
            slabs[t] = jax.lax.dynamic_slice_in_dim(d_big, pos, sizes[t])
            pos += sizes[t]
    d_table = jnp.concatenate(slabs, axis=0)
    return d_table, None


_fused_gather.defvjp(_fused_gather_fwd, _fused_gather_bwd)


class Embeddings(nn.Module):
    """Per-field embeddings stacked to [B, F, D] (or [B, ..., F, D]).

    token fields -> table lookup; token_seq -> lookup + mean/sum pooling over
    non-pad entries; float -> dense embedding (optionally shared).
    """
    field_specs: Tuple[FieldSpecTuple, ...]
    embed_dim: int
    reduction: str = "mean"
    share_dense_embedding: bool = False
    dense_emb_bias: bool = False

    @nn.compact
    def __call__(self, batch, training: bool = False):
        # Token fields are fused into ONE concatenated table + a single
        # offset-id gather, and non-shared float fields into ONE [Fd, D]
        # kernel: criteo-shape models (26 token + 13 float fields) otherwise
        # emit 39 separate lookup subgraphs, which multiplies XLA compile
        # time ~5s/field and serializes small gathers at runtime. Field
        # order in the [..., F, D] output is preserved.
        embs: list = [None] * len(self.field_specs)
        token = [(i, s) for i, s in enumerate(self.field_specs) if s[1] == "token"]
        floats = [(i, s) for i, s in enumerate(self.field_specs)
                  if s[1] not in ("token", "token_seq")]

        if len(token) == 1:   # keep the per-field param name for the common case
            i, (name, _, n) = token[0]
            table = self.param(f"{name}_embedding", nn.initializers.normal(0.02),
                               (n, self.embed_dim))
            embs[i] = table.at[batch[name]].get(mode="promise_in_bounds")
        elif token:
            sizes = [n for _, (_, _, n) in token]
            stored = (self.variables.get("params", {}).get("token_embedding")
                      if self.has_variable("params", "token_embedding")
                      else None)
            packed = (stored.shape[-1] == 3 * self.embed_dim
                      if stored is not None else bool(_PACKED_MOMENTS))
            if packed:
                table = self.param(
                    "token_embedding",
                    _packed_table_init(sum(sizes), self.embed_dim))
            else:
                table = self.param("token_embedding",
                                   nn.initializers.normal(0.02),
                                   (sum(sizes), self.embed_dim))
            offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
            ids = jnp.stack([batch[name] + off
                             for (_, (name, _, _)), off in zip(token, offs)],
                            axis=-1)                           # [..., T]
            key = "/".join(str(p) for p in self.path)
            if _PROBE_DISCOVERY is not None and ids.ndim == 2:
                _PROBE_DISCOVERY[key] = {
                    "param_path": tuple(self.path) + ("token_embedding",),
                    "fields": tuple(name for _, (name, _, _) in token),
                    "sizes": tuple(int(v) for v in sizes),
                    "offsets": tuple(int(o) for o in offs),
                    "embed_dim": int(self.embed_dim),
                }
            probes = (batch.get("__emb_probes__")
                      if isinstance(batch, dict) else None)
            # row-sparse fits declare this leaf [N, 3D] (params | mu | nu,
            # _packed_table_init above) so the optimizer applies ONE row
            # scatter instead of three; reads gather the wide rows and
            # slice the param columns (scatter cost is per-row — the 3x
            # narrower-row traffic is free below 128 lanes)
            is_packed = (table.shape[-1] == 3 * self.embed_dim
                         and table.shape[-1] != self.embed_dim)
            if probes is not None and key in probes:
                # row-sparse mode: the table read is non-differentiable;
                # grads flow through the zero probe (one row per lookup).
                # ONE plain gather, not the one-hot/_fused_gather split:
                # with no backward through the table, the one-hot matmuls
                # only pressure XLA's layout assignment into a row-MINOR
                # {0,1} table layout whose big-field gather lowers to a
                # full-table windowed scan (measured +20 ms/step at 6.5M
                # rows; values are bit-identical either way)
                raw = jax.lax.stop_gradient(table).at[ids].get(
                    mode="promise_in_bounds")
                if is_packed:
                    raw = raw[..., :self.embed_dim]
                fused = raw + probes[key]
            elif is_packed:
                # eval/predict while the row-sparse fit owns the leaf: no
                # grads flow here, and slicing columns after the gather
                # avoids materializing a full [N, D] param copy per call
                fused = jax.lax.stop_gradient(table).at[ids].get(
                    mode="promise_in_bounds")[..., :self.embed_dim]
            else:
                fused = _fused_gather(tuple(sizes), table, ids)  # [..., T, D]
            for k, (i, _) in enumerate(token):
                embs[i] = fused[..., k, :]

        shared_dense = None
        if self.share_dense_embedding and floats:
            shared_dense = DenseEmbedding(self.embed_dim, self.dense_emb_bias,
                                          name="shared_dense")
            for i, (name, _, _) in floats:
                embs[i] = shared_dense(batch[name].astype(jnp.float32))
        elif len(floats) == 1:
            i, (name, _, _) = floats[0]
            embs[i] = DenseEmbedding(self.embed_dim, self.dense_emb_bias,
                                     name=f"{name}_dense")(
                batch[name].astype(jnp.float32))
        elif floats:
            # per-field scalar->vector weights; stddev 1 matches the scale of
            # the per-field Dense(1, D) (lecun_normal at fan_in=1) it fuses
            kernel = self.param("dense_embedding",
                                nn.initializers.normal(1.0),
                                (len(floats), self.embed_dim))
            xs = jnp.stack([batch[name].astype(jnp.float32)
                            for _, (name, _, _) in floats], axis=-1)
            fused = xs[..., None] * kernel                     # [..., Fd, D]
            if self.dense_emb_bias:
                bias = self.param("dense_embedding_bias",
                                  nn.initializers.zeros,
                                  (len(floats), self.embed_dim))
                fused = fused + bias
            for k, (i, _) in enumerate(floats):
                embs[i] = fused[..., k, :]

        for i, (name, t, n) in enumerate(self.field_specs):
            if t != "token_seq":
                continue
            d = batch[name]
            table = self.param(f"{name}_embedding", nn.initializers.normal(0.02),
                               (n, self.embed_dim))
            e = table.at[d].get(mode="promise_in_bounds")      # [..., L, D]
            valid = (d > 0).astype(e.dtype)[..., None]
            s = (e * valid).sum(-2)
            if self.reduction == "mean":
                s = s / jnp.maximum(valid.sum(-2), 1.0)
            embs[i] = s
        return jnp.stack(embs, axis=-2)                        # [..., F, D]

    @property
    def num_features(self) -> int:
        return len(self.field_specs)


class LinearLayer(nn.Module):
    """First-order term: sum of 1-d field embeddings + bias."""
    field_specs: Tuple[FieldSpecTuple, ...]
    bias: bool = True

    @nn.compact
    def __call__(self, batch, training: bool = False):
        emb = Embeddings(self.field_specs, 1, name="embedding")(batch)  # [..., F, 1]
        out = emb.squeeze(-1).sum(-1)
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (1,))
            out = out + b[0]
        return out


class FMLayer(nn.Module):
    """Second-order FM interaction: 0.5*((sum v)^2 - sum v^2)."""
    reduction: Optional[str] = None

    def __call__(self, inputs):
        square_of_sum = jnp.sum(inputs, axis=-2) ** 2
        sum_of_square = jnp.sum(inputs ** 2, axis=-2)
        output = 0.5 * (square_of_sum - sum_of_square)         # [..., D]
        if self.reduction == "sum":
            return output.sum(-1)
        if self.reduction == "mean":
            return output.mean(-1)
        return output


class CrossNetwork(nn.Module):
    """DCN cross layers: x_{l+1} = x0 * (w^T x_l) + b + x_l."""
    embed_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x0):
        x = x0
        for i in range(self.num_layers):
            w = self.param(f"w_{i}", nn.initializers.normal(1.0), (self.embed_dim,))
            b = self.param(f"b_{i}", nn.initializers.zeros, (self.embed_dim,))
            x = x + x0 * (x @ w)[..., None] + b
        return x


class CrossNetworkV2(nn.Module):
    """DCNv2 cross layers: x_{l+1} = x0 * (W x_l + b) + x_l."""
    embed_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x0):
        x = x0
        for i in range(self.num_layers):
            x = x0 * nn.Dense(self.embed_dim, name=f"linear_{i}")(x) + x
        return x


class InnerProductLayer(nn.Module):
    """Pairwise field inner products: [B, F, D] -> [B, F*(F-1)/2(, D)]."""
    num_fields: int
    reduction: bool = True  # True -> scalar per pair; False -> vector per pair

    def __call__(self, inputs):
        F = self.num_fields
        rows, cols = jnp.triu_indices(F, k=1)
        p = inputs[..., rows, :] * inputs[..., cols, :]        # [..., P, D]
        if self.reduction:
            return p.sum(-1)
        return p


class OuterProductLayer(nn.Module):
    """Pairwise kernel-weighted outer products (PNN)."""
    num_fields: int
    embed_dim: int

    @nn.compact
    def __call__(self, inputs):
        F = self.num_fields
        rows, cols = jnp.triu_indices(F, k=1)
        num_pairs = len(rows)
        kernel = self.param("kernel", nn.initializers.xavier_uniform(),
                            (self.embed_dim, num_pairs, self.embed_dim))
        p = inputs[..., rows, :]                               # [..., P, D]
        q = inputs[..., cols, :]
        kp = jnp.einsum("...pd,dpe->...pe", p, kernel)
        return (kp * q).sum(-1)                                # [..., P]


class CIN(nn.Module):
    """Compressed interaction network (xDeepFM)."""
    embed_dim: int
    num_features: int
    cin_layer_size: Sequence[int]
    activation: str = "relu"
    direct: bool = True

    @nn.compact
    def __call__(self, inputs):
        B, F0, D = inputs.shape
        sizes = list(self.cin_layer_size)
        if not self.direct:
            sizes = [s // 2 * 2 for s in sizes[:-1]] + [sizes[-1]]
        act = get_act(self.activation)
        hidden = inputs
        finals = []
        for i, size in enumerate(sizes):
            z = jnp.einsum("bhd,bmd->bhmd", hidden, inputs)
            z = z.reshape(B, hidden.shape[1] * F0, D)
            w = self.param(f"conv_{i}", nn.initializers.xavier_uniform(),
                           (hidden.shape[1] * F0, size))
            b = self.param(f"conv_b_{i}", nn.initializers.zeros, (size,))
            out = act(jnp.einsum("bkd,kh->bhd", z, w) + b[None, :, None])
            if self.direct:
                finals.append(out)
                hidden = out
            else:
                if i != len(sizes) - 1:
                    hidden, direct = jnp.split(out, 2, axis=1)
                else:
                    direct, hidden = out, None
                finals.append(direct)
        result = jnp.concatenate(finals, axis=1).sum(-1)       # [B, sum(sizes)]
        return nn.Dense(1, name="linear")(result).squeeze(-1)


class AFMLayer(nn.Module):
    """Attentional FM: attention over pairwise interactions."""
    embed_dim: int
    attention_dim: int
    num_fields: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        prod = InnerProductLayer(self.num_fields, reduction=False)(inputs)  # [B, P, D]
        h = nn.Dense(self.attention_dim, name="attn_w")(prod)
        h = jax.nn.relu(h)
        a = nn.Dense(1, use_bias=False, name="attn_h")(h)
        a = jax.nn.softmax(a, axis=1)
        out = (a * prod).sum(1)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return nn.Dense(1, use_bias=False, name="p")(out).squeeze(-1)


class FieldAwareFMLayer(nn.Module):
    """FFM interaction: each field keeps one latent vector per other field;
    score = sum_{i<j} <v_{i,j}, v_{j,i}> (reference ctr.py:991)."""
    num_fields: int

    def __call__(self, inputs):
        # inputs: [B, F, (F-1)*D] -> [B, F, F-1, D]
        B, F = inputs.shape[0], self.num_fields
        emb = inputs.reshape(B, F, F - 1, -1)
        rows, cols = jnp.triu_indices(F, k=1)
        # v_{i, j} lives at slot (j-1) of field i when j > i; v_{j, i} at slot i
        a = emb[:, rows, cols - 1, :]
        b = emb[:, cols, rows, :]
        return (a * b).sum(axis=(-1, -2))


class FMFMLayer(nn.Module):
    """Field-matrixed FM: pairwise <W_ij e_i, e_j> (FmFM, reference ctr.py)."""
    num_fields: int
    embed_dim: int

    @nn.compact
    def __call__(self, inputs):
        F = self.num_fields
        rows, cols = jnp.triu_indices(F, k=1)
        W = self.param("field_weight", nn.initializers.normal(1.0),
                       (len(rows), self.embed_dim, self.embed_dim))
        e0 = inputs[:, rows, :]
        e1 = inputs[:, cols, :]
        proj = jnp.einsum("bpd,pde->bpe", e0, W)
        return (proj * e1).sum(axis=(-1, -2))


class SqueezeExcitation(nn.Module):
    """SENET field reweighting (FiBiNET, reference ctr.py:750)."""
    num_fields: int
    reduction_ratio: float
    activation: str = "relu"
    pool: str = "avg"

    @nn.compact
    def __call__(self, inputs):
        z = inputs.mean(-1) if self.pool == "avg" else inputs.max(-1)
        reduced = max(1, int(self.num_fields // self.reduction_ratio))
        act = get_act(self.activation)
        a = act(nn.Dense(reduced, use_bias=False, name="squeeze")(z))
        a = act(nn.Dense(self.num_fields, use_bias=False, name="excite")(a))
        return inputs * a[..., None]


class BilinearInteraction(nn.Module):
    """Bilinear field interaction (FiBiNET, reference ctr.py:788)."""
    num_fields: int
    embed_dim: int
    bilinear_type: str = "interaction"

    @nn.compact
    def __call__(self, inputs):
        F, D = self.num_fields, self.embed_dim
        rows, cols = jnp.triu_indices(F, k=1)
        bt = self.bilinear_type.lower()
        if bt == "all":
            W = self.param("weight", nn.initializers.normal(1.0), (D, D))
            hidden = inputs @ W
            out = hidden[:, rows, :] * inputs[:, cols, :]
        elif bt == "each":
            W = self.param("weight", nn.initializers.normal(1.0), (F, D, D))
            hidden = jnp.einsum("bfd,fde->bfe", inputs, W)
            out = hidden[:, rows, :] * inputs[:, cols, :]
        else:  # interaction
            W = self.param("weight", nn.initializers.normal(1.0),
                           (len(rows), D, D))
            e0 = inputs[:, rows, :]
            out = jnp.einsum("bpd,pde->bpe", e0, W) * inputs[:, cols, :]
        return out                                             # [B, P, D]


class MaskBlock(nn.Module):
    """Instance-guided mask block (MaskNet, reference ctr.py:828)."""
    input_dim: int
    hidden_dim: int
    output_dim: int
    reduction_ratio: float = 1.0
    activation: str = "relu"
    dropout: float = 0.0
    layer_norm: bool = True

    @nn.compact
    def __call__(self, v_emb, v, training: bool = False):
        h = jax.nn.relu(nn.Dense(int(self.hidden_dim * self.reduction_ratio),
                                 name="mask_1")(v_emb))
        mask = nn.Dense(self.hidden_dim, name="mask_2")(h)
        out = nn.Dense(self.output_dim, use_bias=False, name="hidden")(mask * v)
        if self.layer_norm:
            out = nn.LayerNorm(name="ln")(out)
        out = get_act(self.activation)(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return out


class OperationAwareFMLayer(nn.Module):
    """ONN interaction (reference ctr.py:964): per-field operation-aware copies;
    output = [diag copies ; pairwise <v_i^(j), v_j^(i)>]."""
    num_fields: int

    def __call__(self, inputs):
        B, F = inputs.shape[0], self.num_fields
        fw = inputs.reshape(B, F, F, -1)                    # [B, F, F, D]
        diag = fw[:, jnp.arange(F), jnp.arange(F), :].reshape(B, -1)
        inner = (fw.transpose(0, 2, 1, 3) * fw).sum(-1)     # [B, F, F]
        rows, cols = jnp.triu_indices(F, k=1)
        ffm_out = inner[:, rows, cols]
        return jnp.concatenate([diag, ffm_out], axis=1)


class HolographicFMLayer(nn.Module):
    """HFM interaction (reference ctr.py:1312): circular correlation /
    convolution of field pairs."""
    num_fields: int
    op: str = "circular_correlation"

    def __call__(self, inputs):
        F = self.num_fields
        rows, cols = jnp.triu_indices(F, k=1)
        a, b = inputs[:, rows, :], inputs[:, cols, :]
        fa, fb = jnp.fft.rfft(a, axis=-1), jnp.fft.rfft(b, axis=-1)
        if self.op == "circular_correlation":
            out = jnp.fft.irfft(jnp.conj(fa) * fb, n=a.shape[-1], axis=-1)
        elif self.op == "circular_convolution":
            out = jnp.fft.irfft(fa * fb, n=a.shape[-1], axis=-1)
        else:  # elementwise product
            out = a * b
        return out                                           # [B, P, D]


class LogTransformLayer(nn.Module):
    """AFN logarithmic transform (reference ctr.py:540)."""
    num_fields: int
    hidden_size: int
    clamp_min: float = 1e-5

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        from .layers import SimpleBatchNorm
        emb = jnp.maximum(jnp.abs(inputs), self.clamp_min)
        log_emb = SimpleBatchNorm(name="log_bn")(jnp.log(emb), training)
        log_out = nn.Dense(self.hidden_size, name="linear")(
            log_emb.transpose(0, 2, 1)).transpose(0, 2, 1)
        exp_out = SimpleBatchNorm(name="exp_bn")(jnp.exp(log_out), training)
        return exp_out.reshape(exp_out.shape[0], -1)


class SelfAttentionInteractingLayer(nn.Module):
    """AutoInt block: multi-head self-attention over field embeddings."""
    embed_dim: int
    n_head: int = 1
    dropout: float = 0.0
    residual: bool = True
    residual_project: bool = True
    layer_norm: bool = False

    @nn.compact
    def __call__(self, inputs, training: bool = False):
        out = MultiHeadAttention(self.embed_dim, self.n_head, self.dropout,
                                 name="attn")(inputs, inputs, inputs,
                                              training=training)
        if self.residual:
            res = nn.Dense(self.embed_dim, name="res")(inputs) \
                if self.residual_project else inputs
            out = out + res
        if self.layer_norm:
            out = nn.LayerNorm(name="ln")(out)
        return jax.nn.relu(out)
