"""Contrastive-learning toolkit (graph + sequence augmentation).

Pure-JAX re-implementation of recstudio/model/module/data_augmentation.py:
the InfoNCE contrastive loss (batch_both / batch_single / all negatives,
:307-403), sequence augmentation ops (crop / mask / reorder, :22-146, kept
static-shape via masks and fixed-size permutation windows), and the model-level
augmentation heads used by SGL / SimGCL / NCL / CL4SRec.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _normalize(x, eps=1e-12):
    # rsqrt form: zero rows get zero output with zero (not NaN) gradient
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + eps)


def info_nce(rep_i: jax.Array, rep_j: jax.Array, temperature: float = 1.0,
             sim_method: str = "inner_product", neg_type: str = "batch_both",
             all_reps: Optional[jax.Array] = None,
             instance_labels: Optional[jax.Array] = None) -> jax.Array:
    """InfoNCE with the reference's three negative strategies."""
    if sim_method == "cosine":
        rep_i = _normalize(rep_i)
        rep_j = _normalize(rep_j)
        if all_reps is not None:
            all_reps = _normalize(all_reps)
    B = rep_i.shape[0]
    if neg_type == "all":
        sim_ij = rep_i @ all_reps.T / temperature            # [B, N]
        sim_ii = (rep_i * rep_j).sum(-1) / temperature       # [B]
        return jnp.mean(jax.nn.logsumexp(sim_ij, axis=-1) - sim_ii)
    sim_ij = rep_i @ rep_j.T / temperature                    # [B, B]
    eye = jnp.eye(B, dtype=bool)
    if neg_type == "batch_both":
        sim_ii = rep_i @ rep_i.T / temperature
        if instance_labels is not None:
            same = instance_labels[:, None] == instance_labels[None, :]
            sim_ii = jnp.where(same, -jnp.inf, sim_ii)
            sim_ij = jnp.where(same & ~eye, -jnp.inf, sim_ij)
        else:
            sim_ii = jnp.where(eye, -jnp.inf, sim_ii)
        logits = jnp.concatenate([sim_ij, sim_ii], axis=-1)   # [B, 2B]
    elif neg_type == "batch_single":
        if instance_labels is not None:
            same = instance_labels[:, None] == instance_labels[None, :]
            sim_ij = jnp.where(same & ~eye, -jnp.inf, sim_ij)
        logits = sim_ij
    else:
        raise ValueError(f"unknown neg_type {neg_type}")
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.diagonal(log_probs[:, :B]))


# ---------------------------------------------------------------------------
# sequence augmentation ops (static-shape: ops return (seq, seqlen))
# ---------------------------------------------------------------------------
def item_crop(rng, seq, seqlen, eta: float = 0.6):
    """Random contiguous crop of ratio eta, left-aligned (reference :22)."""
    L = seq.shape[1]
    crop_len = jnp.maximum((eta * seqlen).astype(jnp.int32), 1)
    max_start = jnp.maximum(seqlen - crop_len, 0)
    start = (jax.random.uniform(rng, (seq.shape[0],)) * (max_start + 1)).astype(jnp.int32)
    pos = jnp.arange(L)[None, :]
    gather = jnp.minimum(start[:, None] + pos, L - 1)
    cropped = jnp.take_along_axis(seq, gather, axis=1)
    valid = pos < crop_len[:, None]
    return jnp.where(valid, cropped, 0), crop_len


def item_mask(rng, seq, seqlen, gamma: float = 0.3, mask_id: int = 0):
    """Randomly mask a gamma fraction of real positions (reference :45)."""
    L = seq.shape[1]
    pos = jnp.arange(L)[None, :]
    real = pos < seqlen[:, None]
    u = jax.random.uniform(rng, seq.shape)
    masked = (u < gamma) & real
    return jnp.where(masked, mask_id, seq), seqlen


def item_random(rng, seq, seqlen, mask_id: int = 0,
                eta: float = 0.6, gamma: float = 0.3, beta: float = 0.6):
    """Pick crop / mask / reorder uniformly per sample (reference :89)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    crop_s, crop_l = item_crop(k1, seq, seqlen, eta)
    mask_s, mask_l = item_mask(k2, seq, seqlen, gamma, mask_id)
    reord_s, reord_l = item_reorder(k3, seq, seqlen, beta)
    choice = jax.random.randint(k4, (seq.shape[0], 1), 0, 3)
    out_seq = jnp.where(choice == 0, crop_s, jnp.where(choice == 1, mask_s, reord_s))
    c = choice[:, 0]
    out_len = jnp.where(c == 0, crop_l, jnp.where(c == 1, mask_l, reord_l))
    return out_seq, out_len


def item_substitute(rng, seq, seqlen, top1_sim, rate: float = 0.1):
    """Replace a `rate` fraction of real positions with their most-similar
    item (reference :99). ``top1_sim``: [num_items] most-similar-item table."""
    L = seq.shape[1]
    pos = jnp.arange(L)[None, :]
    real = pos < seqlen[:, None]
    u = jax.random.uniform(rng, seq.shape)
    # guarantee >= 1 substitution: always include the argmin-u real position
    forced = u + (~real) * 2.0
    forced_idx = jnp.argmin(forced, axis=1)
    subs = ((u < rate) & real)
    subs = subs.at[jnp.arange(seq.shape[0]), forced_idx].set(True)
    return jnp.where(subs & real, top1_sim[seq], seq), seqlen


def item_insert(rng, seq, seqlen, top1_sim, rate: float = 0.4):
    """Insert the most-similar item before a `rate` fraction of positions
    (reference :146), keeping the most recent window when the result exceeds
    the static length."""
    B, L = seq.shape
    pos = jnp.arange(L)[None, :]
    real = pos < seqlen[:, None]
    u = jax.random.uniform(rng, seq.shape)
    forced = u + (~real) * 2.0
    forced_idx = jnp.argmin(forced, axis=1)
    ins = ((u < rate) & real)
    ins = ins.at[jnp.arange(B), forced_idx].set(True)
    # doubled layout: [sim_0, s_0, sim_1, s_1, ...]
    doubled = jnp.zeros((B, 2 * L), seq.dtype)
    doubled = doubled.at[:, 1::2].set(jnp.where(real, seq, 0))
    doubled = doubled.at[:, 0::2].set(jnp.where(ins, top1_sim[seq], 0))
    valid = doubled != 0
    # left-compact preserving order
    keys = jnp.where(valid, jnp.arange(2 * L)[None, :], 2 * L + 1)
    order = jnp.argsort(keys, axis=1)
    compact = jnp.take_along_axis(doubled, order, axis=1)
    new_len_full = seqlen + ins.sum(1)
    shift = jnp.maximum(new_len_full - L, 0)               # keep the last L
    gather = jnp.minimum(shift[:, None] + pos, 2 * L - 1)
    out = jnp.take_along_axis(compact, gather, axis=1)[:, :L]
    return out, jnp.minimum(new_len_full, L)


def item_reorder(rng, seq, seqlen, beta: float = 0.6):
    """Shuffle a random contiguous window of ratio beta (reference :66)."""
    B, L = seq.shape
    reorder_len = jnp.maximum((beta * seqlen).astype(jnp.int32), 1)
    max_start = jnp.maximum(seqlen - reorder_len, 0)
    start = (jax.random.uniform(rng, (B,)) * (max_start + 1)).astype(jnp.int32)
    noise = jax.random.uniform(jax.random.fold_in(rng, 1), seq.shape)
    pos = jnp.arange(L)[None, :]
    in_window = (pos >= start[:, None]) & (pos < (start + reorder_len)[:, None])
    # window elements get random keys inside [start, start+1) so argsort shuffles
    # them among the window slots while everything else stays in place
    sort_key = jnp.where(in_window, start[:, None] + noise, pos.astype(jnp.float32))
    perm = jnp.argsort(sort_key, axis=1)
    return jnp.take_along_axis(seq, perm, axis=1), seqlen
