"""Plain-torch implementations of the torchmetrics.functional calls the
reference makes (reference eval/__init__.py:33,59,81,199,216,221,226 —
binary task only)."""
import numpy as np
import torch


def _binarize(pred, threshold):
    return (pred >= threshold).long()


def recall(pred, target, task="binary", threshold=0.5):
    p, t = _binarize(pred, threshold), target.long()
    tp = ((p == 1) & (t == 1)).sum().float()
    fn = ((p == 0) & (t == 1)).sum().float()
    return tp / torch.clamp(tp + fn, min=1)


def precision(pred, target, task="binary", threshold=0.5):
    p, t = _binarize(pred, threshold), target.long()
    tp = ((p == 1) & (t == 1)).sum().float()
    fp = ((p == 1) & (t == 0)).sum().float()
    return tp / torch.clamp(tp + fp, min=1)


def f1_score(pred, target, task="binary", threshold=0.5):
    r = recall(pred, target, threshold=threshold)
    pr = precision(pred, target, threshold=threshold)
    return 2 * pr * r / torch.clamp(pr + r, min=1e-12)


def auroc(pred, target, task="binary"):
    """Tie-aware rank-statistic AUC (identical to the Mann-Whitney form the
    real torchmetrics computes for binary auroc)."""
    t = target.long().double()
    s = pred.detach().cpu().numpy()
    uniq, inv, counts = np.unique(s, return_inverse=True, return_counts=True)
    start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    avg_rank = start + (counts - 1) / 2.0 + 1.0
    ranks = torch.from_numpy(avg_rank[inv])
    npos = t.sum()
    nneg = t.numel() - npos
    if npos == 0 or nneg == 0:
        return torch.tensor(0.5)
    return ((ranks * t).sum() - npos * (npos + 1) / 2) / (npos * nneg)


def accuracy(pred, target, task="binary", threshold=0.5):
    return (_binarize(pred, threshold) == target.long()).float().mean()


def mean_squared_error(pred, target):
    return ((pred - target.float()) ** 2).mean()


def mean_absolute_error(pred, target):
    return (pred - target.float()).abs().mean()
