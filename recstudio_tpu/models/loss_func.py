"""Loss library: three families with the sampled-softmax contract.

Mirrors the reference's loss taxonomy and signatures
(recstudio/model/loss_func.py): ``FullScoreLoss(label, pos_score, all_score)``,
``PairwiseLoss(label, pos_score, log_pos_prob, neg_score, log_neg_prob)``,
``PointwiseLoss(label, pos_score)``. The log-prob arguments carry sampler
proposal probabilities for importance correction, tying losses to the sampler
zoo. Padding positions are signalled by ``pos_score == -inf`` (sequence models)
and are masked out of every reduction.

All losses are stateless callables over jnp arrays — safe under jit/grad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class FullScoreLoss:
    """Needs scores on ALL items; use only with small catalogs."""

    def __call__(self, label, pos_score, all_score):
        raise NotImplementedError


class PairwiseLoss:
    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        raise NotImplementedError


class PointwiseLoss:
    def __call__(self, label, pos_score):
        raise NotImplementedError


def _not_pad(pos_score):
    return jnp.logical_not(jnp.isinf(pos_score))


class SoftmaxLoss(FullScoreLoss):
    def __call__(self, label, pos_score, all_score):
        if all_score.ndim > pos_score.ndim:
            # per-position softmax (all_score [..., N] aligned with pos_score
            # [...]): global mean over non-padded positions — identical to the
            # reference's mean over flattened masked positions
            out = jax.nn.logsumexp(all_score, axis=-1) - pos_score
            valid = _not_pad(pos_score)
            out = jnp.where(valid, out, 0.0)
            return out.sum() / jnp.maximum(valid.sum(), 1)
        # one softmax per row shared by multiple positives (AutoEncoder case)
        out = jax.nn.logsumexp(all_score, axis=-1, keepdims=True) - pos_score
        valid = _not_pad(pos_score)
        out = jnp.where(valid, out, 0.0)
        return jnp.mean(out.sum(-1) / jnp.maximum(valid.sum(-1), 1))


class BPRLoss(PairwiseLoss):
    def __init__(self, dns: bool = False):
        self.dns = dns

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        if not self.dns:
            diff = jax.nn.log_sigmoid(pos_score[..., None] - neg_score)
            return -jnp.mean(diff.mean(-1))
        return -jnp.mean(jax.nn.log_sigmoid(pos_score - jnp.max(neg_score, axis=-1)))


class Top1Loss(BPRLoss):
    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        if not self.dns:
            loss = jax.nn.sigmoid(neg_score - pos_score[..., None])
            loss += jax.nn.sigmoid(neg_score ** 2)
            return jnp.mean(loss.mean(-1))
        max_neg = jnp.max(neg_score, axis=-1)
        return jnp.mean(jax.nn.sigmoid(max_neg - pos_score) + jax.nn.sigmoid(max_neg ** 2))


class SampledSoftmaxLoss(PairwiseLoss):
    """Sampled softmax with log-Q (proposal probability) correction."""

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        new_pos = pos_score - log_pos_prob
        new_neg = neg_score - log_neg_prob
        if new_pos.ndim < new_neg.ndim:
            new_pos = new_pos[..., None]
        full = jnp.concatenate([new_pos, new_neg], axis=-1)
        out = jax.nn.logsumexp(full, axis=-1, keepdims=True) - new_pos
        valid = _not_pad(new_pos)
        out = jnp.where(valid, out, 0.0)
        return jnp.mean(out.sum(-1) / jnp.maximum(valid.sum(-1), 1))


class InfoNCELoss(SampledSoftmaxLoss):
    """Sampled softmax without the proposal correction."""

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        return super().__call__(label, pos_score, jnp.zeros_like(pos_score),
                                neg_score, jnp.zeros_like(neg_score))


class WeightedBPRLoss(PairwiseLoss):
    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        diff = jax.nn.log_sigmoid(pos_score[..., None] - neg_score)
        weight = jax.nn.softmax(neg_score - log_neg_prob, axis=-1)
        return -jnp.mean((diff * weight).sum(-1))


class BinaryCrossEntropyLoss(PairwiseLoss):
    def __init__(self, dns: bool = False):
        self.dns = dns

    def _weight(self, neg_score, log_neg_prob):
        return jnp.ones_like(neg_score) / neg_score.shape[-1]

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        if self.dns:
            return jnp.mean(-jax.nn.log_sigmoid(pos_score)
                            + jax.nn.softplus(jnp.max(neg_score, axis=-1)))
        weight = self._weight(neg_score, log_neg_prob)
        pad = jnp.isinf(pos_score)
        pos_loss = jnp.where(pad, 0.0, jax.nn.log_sigmoid(pos_score))
        denom = jnp.maximum((~pad).sum(), 1)
        pos_loss = pos_loss.sum() / denom
        neg_loss = (jax.nn.softplus(neg_score) * weight).sum(-1)
        if pos_score.ndim == neg_score.ndim - 1:
            neg_loss = jnp.where(pad, 0.0, neg_loss).sum() / denom
        else:
            neg_loss = jnp.mean(neg_loss)
        return -pos_loss + neg_loss


class WeightedBinaryCrossEntropyLoss(BinaryCrossEntropyLoss):
    def _weight(self, neg_score, log_neg_prob):
        return jax.nn.softmax(neg_score - log_neg_prob, axis=-1)


class HingeLoss(PairwiseLoss):
    def __init__(self, margin: float = 2.0, num_items: int | None = None):
        self.margin = margin
        self.n_items = num_items

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        loss = jnp.maximum(jnp.max(neg_score, axis=-1) - pos_score + self.margin, 0.0)
        if self.n_items is not None:
            impostors = (neg_score - pos_score[..., None] + self.margin) > 0
            rank = impostors.mean(-1) * self.n_items
            return jnp.mean(loss * jnp.log(rank + 1.0))
        return jnp.mean(loss)


class NCELoss(PairwiseLoss):
    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        new_pos = pos_score - log_pos_prob
        new_neg = neg_score - log_neg_prob
        loss = jax.nn.log_sigmoid(new_pos) + (new_neg - jax.nn.softplus(new_neg)).sum(-1)
        return -jnp.mean(loss)


class CCLLoss(PairwiseLoss):
    def __init__(self, margin: float = 0.8, neg_weight: float = 0.3):
        self.margin = margin
        self.neg_weight = neg_weight

    def __call__(self, label, pos_score, log_pos_prob, neg_score, log_neg_prob):
        pad = jnp.isinf(pos_score)
        pos = jax.nn.sigmoid(pos_score)
        neg = jax.nn.sigmoid(neg_score)
        neg_mean = jnp.maximum(neg - self.margin, 0.0).mean(-1)
        loss = (1.0 - pos) + self.neg_weight * neg_mean
        loss = jnp.where(pad, 0.0, loss)
        return loss.sum() / jnp.maximum((~pad).sum(), 1)


class SquareLoss(PointwiseLoss):
    def __call__(self, label, pos_score):
        sq = jnp.square(label - pos_score)
        if label.ndim > 1:
            return jnp.mean(sq.mean(-1))
        return jnp.mean(sq)


class BCEWithLogitLoss(PointwiseLoss):
    def __init__(self, reduction: str = "mean"):
        self.reduction = reduction

    def __call__(self, label, pos_score):
        loss = jax.nn.softplus(pos_score) - pos_score * label
        return jnp.mean(loss) if self.reduction == "mean" else loss


class BCELoss(PointwiseLoss):
    def __init__(self, reduction: str = "mean", eps: float = 1e-7):
        self.reduction = reduction
        self.eps = eps

    def __call__(self, label, pos_score):
        p = jnp.clip(pos_score, self.eps, 1.0 - self.eps)
        loss = -(label * jnp.log(p) + (1.0 - label) * jnp.log(1.0 - p))
        return jnp.mean(loss) if self.reduction == "mean" else loss


class MSELoss(PointwiseLoss):
    def __init__(self, threshold: float | None = None, reduction: str = "mean"):
        self.threshold = threshold
        self.reduction = reduction

    def __call__(self, label, pos_score):
        if self.threshold is not None:
            label = (label > self.threshold).astype(pos_score.dtype)
        loss = jnp.square(pos_score - label)
        return jnp.mean(loss) if self.reduction == "mean" else loss


def l2_reg_loss_fn(*embs):
    loss = 0.0
    for emb in embs:
        loss = loss + jnp.mean(jnp.sum(emb * emb, axis=-1))
    return loss
