"""Attention-gated GRU variants (DIEN family).

Re-expresses the reference's manually-unrolled interest-evolution cells
(reference recstudio/model/module/gru.py: AIGRU:4, AGRUCell:50, AUGRUCell:68,
AGRU:94, AUGRU:159) as ``lax.scan`` recurrences — compiler-friendly static
control flow instead of a Python loop over timesteps.

All take ``x [B, L, D]`` and per-step attention scores ``att [B, L]``:
- ``AIGRU``: standard GRU over attention-scaled inputs ``att * x``.
- ``AGRU``: the attention score REPLACES the update gate:
  ``h_t = (1 - a_t) h_{t-1} + a_t h~_t``.
- ``AUGRU``: the attention score scales the update gate:
  ``u'_t = a_t * u_t``; ``h_t = (1 - u'_t) h_{t-1} + u'_t h~_t``.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _GatedGRU(nn.Module):
    """Shared scan body for AGRU ('replace') and AUGRU ('scale')."""
    hidden_size: int
    mode: str  # 'replace' | 'scale'

    @nn.compact
    def __call__(self, x, att):
        B, L, D = x.shape
        H = self.hidden_size
        # input projections are h-independent: hoist them out of the scan
        gi_all = nn.Dense(3 * H, name="w_ih")(x)             # [B, L, 3H]
        w_hh = self.param("w_hh", nn.initializers.lecun_normal(), (H, 3 * H))
        mode = self.mode

        def cell(h, inputs):
            gi, at = inputs                                  # [B, 3H], [B]
            gh = h @ w_hh
            i_r, i_u, i_n = jnp.split(gi, 3, axis=-1)
            h_r, h_u, h_n = jnp.split(gh, 3, axis=-1)
            r = jax.nn.sigmoid(i_r + h_r)
            u = jax.nn.sigmoid(i_u + h_u)
            n = jnp.tanh(i_n + r * h_n)
            a = at[:, None]
            gate = a if mode == "replace" else a * u         # AGRU | AUGRU
            h_new = (1.0 - gate) * h + gate * n
            return h_new, h_new

        h0 = jnp.zeros((B, H), x.dtype)
        xs = (gi_all.transpose(1, 0, 2), att.T)              # time-major
        h_last, hs = jax.lax.scan(cell, h0, xs)
        return hs.transpose(1, 0, 2), h_last                 # [B, L, H], [B, H]


class AGRU(nn.Module):
    """GRU whose update gate is replaced by the attention score
    (reference gru.py:50-66,94-157)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, att):
        return _GatedGRU(self.hidden_size, "replace", name="cell")(x, att)


class AUGRU(nn.Module):
    """GRU with attention-scaled update gate (reference gru.py:68-92,159-174)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, att):
        return _GatedGRU(self.hidden_size, "scale", name="cell")(x, att)


class AIGRU(nn.Module):
    """Attention-input GRU: scale inputs by attention, run a plain GRU
    (reference gru.py:4-48)."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, att):
        from .layers import GRULayer
        scaled = x * att[:, :, None]
        return GRULayer(x.shape[-1], self.hidden_size, name="gru")(scaled)
