"""Parameter (re)initialization dispatch.

Mirrors the reference's module-walk initializers (recstudio/model/init.py):
after flax init, the whole param pytree is re-initialized by parameter role —
embedding tables and dense kernels get xavier normal/uniform or N(0, range),
biases zero, LayerNorm scale 1 / bias 0. Row 0 of embedding tables (the
``[PAD]`` row) is zeroed, matching torch's ``padding_idx`` semantics; the
training engine keeps it zero by masking its gradient.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _fans(shape):
    if len(shape) == 1:
        return shape[0], shape[0]
    receptive = 1
    for s in shape[:-2]:
        receptive *= s
    return shape[-2] * receptive, shape[-1] * receptive


def _init_leaf(key, path_names, leaf, method: str, init_range: float):
    name = path_names[-1].lower()
    shape, dtype = leaf.shape, leaf.dtype
    is_embedding = "embedding" in name
    is_kernel = name in ("kernel", "w") or name.endswith("kernel")
    is_bias = name == "bias" or name.endswith("bias")
    is_scale = name == "scale"
    if is_scale:
        return jnp.ones(shape, dtype)
    if is_bias:
        return jnp.zeros(shape, dtype)
    if not (is_embedding or is_kernel) or len(shape) < 2:
        return leaf  # leave exotic params (e.g. learned scalars) as flax made them
    fan_in, fan_out = _fans(shape)
    if method == "normal":
        out = init_range * jax.random.normal(key, shape, jnp.float32)
    elif method == "xavier_uniform":
        limit = (6.0 / (fan_in + fan_out)) ** 0.5
        out = jax.random.uniform(key, shape, jnp.float32, -limit, limit)
    else:  # xavier_normal
        std = (2.0 / (fan_in + fan_out)) ** 0.5
        out = std * jax.random.normal(key, shape, jnp.float32)
    if is_embedding:
        out = out.at[0].set(0.0)  # [PAD] row
    return out.astype(dtype)


def init_parameters(params: Dict[str, Any], rng: jax.Array, method: str = "xavier_normal",
                    init_range: float = 0.02) -> Dict[str, Any]:
    """Re-initialize a flax param pytree by parameter role."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves_with_path, treedef = flat
    keys = jax.random.split(rng, max(len(leaves_with_path), 1))
    new_leaves = []
    for (path, leaf), key in zip(leaves_with_path, keys):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        new_leaves.append(_init_leaf(key, [str(n) for n in names], leaf, method, init_range))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def zero_pad_rows_in_grads(grads: Dict[str, Any]) -> Dict[str, Any]:
    """Zero the gradient of every embedding table's [PAD] row (torch
    padding_idx semantics)."""
    def fix(path, g):
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        # ``dense_embedding(_bias)`` is the fused FLOAT-field kernel
        # [n_float, D] (module/ctr.py Embeddings): its row 0 is the first
        # float field's weights, not a [PAD] vocab row — don't zero it.
        if (names and "embedding" in names[-1].lower() and g.ndim >= 2
                and not names[-1].lower().startswith("dense_embedding")):
            return g.at[0].set(0.0)
        return g
    return jax.tree_util.tree_map_with_path(fix, grads)
