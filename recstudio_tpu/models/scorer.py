"""Score functions between query and item representations.

Same shape polymorphism contract as the reference (recstudio/model/scorer.py):
``(B,D)x(B,D) -> [B]``, ``(B,D)x(B,neg,D) -> [B,neg]``, ``(B,D)x(N,D) -> [B,N]``,
``(B,L,D)x(B,L,D) -> [B,L]``, ``(B,L,D)x(B,L,neg,D) -> [B,L,neg]``.

Parameter-free scorers are plain callables; parameterized scorers (MLP/GMF/
Fusion) are flax modules so they compose into model nets.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def _is_catalog(query, items) -> bool:
    """True for the (..., D) x (N, D) all-item case (catalog scoring)."""
    return items.ndim == 2 and (query.ndim != 2 or query.shape[0] != items.shape[0])


class InnerProductScorer:
    def __call__(self, query, items):
        if _is_catalog(query, items):
            return query @ items.T
        if query.ndim < items.ndim:  # (..., D) x (..., neg, D)
            return jnp.einsum("...d,...nd->...n", query, items)
        return jnp.sum(query * items, axis=-1)


class CosineScorer(InnerProductScorer):
    def __call__(self, query, items):
        out = super().__call__(query, items)
        out = out / jnp.linalg.norm(items, axis=-1)
        keepdim = query.ndim != items.ndim or query.shape[0] != items.shape[0]
        qn = jnp.linalg.norm(query, axis=-1, keepdims=keepdim)
        return out / qn


class EuclideanScorer(InnerProductScorer):
    def __call__(self, query, items):
        out = -2.0 * super().__call__(query, items)
        out = out + jnp.sum(jnp.square(items), axis=-1)
        keepdim = query.ndim != items.ndim or query.shape[0] != items.shape[0]
        out = out + jnp.sum(jnp.square(query), axis=-1, keepdims=keepdim)
        return -out


class NormScorer(InnerProductScorer):
    def __init__(self, p: int = 2):
        self.p = p

    def __call__(self, query, items):
        if query.ndim < items.ndim or query.shape[0] != items.shape[0]:
            query = query[..., None, :]
        return -jnp.linalg.norm(query - items, ord=self.p, axis=-1)


def _pairwise_expand(query, items):
    """Broadcast query/items to a common rank for concat-style scorers."""
    if query.shape[0] == items.shape[0]:
        if query.ndim < items.ndim:
            query = jnp.broadcast_to(query[..., None, :], items.shape)
        return query, items
    # catalog case: [B, D] x [N, D] -> [B, N, D] both
    q = jnp.broadcast_to(query[:, None, :], (query.shape[0], items.shape[0], query.shape[-1]))
    it = jnp.broadcast_to(items[None, :, :], (query.shape[0], items.shape[0], items.shape[-1]))
    return q, it


class MLPScorer(nn.Module):
    """Scores concat(query, item) through a caller-supplied MLP module."""
    transform: nn.Module

    @nn.compact
    def __call__(self, query, items):
        q, it = _pairwise_expand(query, items)
        x = jnp.concatenate([q, it], axis=-1)
        return self.transform(x).squeeze(-1)


class GMFScorer(nn.Module):
    emb_dim: int
    bias: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, query, key):
        assert query.ndim <= key.ndim
        q, k = _pairwise_expand(query, key) if query.ndim == key.ndim and query.shape[0] != key.shape[0] \
            else ((query[:, None, :], key) if query.ndim < key.ndim else (query, key))
        h = q * k
        out = nn.Dense(1, use_bias=self.bias, name="W")(h)
        from .module.layers import get_act
        return get_act(self.activation)(out).squeeze(-1)


class FusionMFMLPScorer(nn.Module):
    """NCF fusion scorer: sigmoid(W [q*k ; MLP(q||k)])."""
    emb_dim: int
    hidden_size: int
    mlp: nn.Module
    bias: bool = False
    activation: str = "relu"

    @nn.compact
    def __call__(self, query, key):
        assert query.ndim <= key.ndim
        if query.ndim < key.ndim:
            query = jnp.broadcast_to(query[:, None, :], key.shape)
        elif query.shape[0] != key.shape[0]:
            query, key = _pairwise_expand(query, key)
        h_mf = query * key
        h_mlp = self.mlp(jnp.concatenate([query, key], axis=-1))
        h = nn.Dense(1, use_bias=False, name="W")(jnp.concatenate([h_mf, h_mlp], axis=-1))
        from .module.layers import get_act
        return get_act(self.activation)(h.squeeze(-1))
