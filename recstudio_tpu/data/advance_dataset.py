"""ALSDataset: alternating-least-squares batches <u, I_u> / transposed <i, U_i>.

Reference: recstudio/data/advance_dataset.py:7-80. Each sample is one user with
all their train items (or, transposed, one item with all its train users), used
by WRMF-style alternating solvers.
"""
from __future__ import annotations

import copy
from typing import Dict

import numpy as np

from .dataset import TripletDataset


class ALSDataset(TripletDataset):

    def build(self, binarized_rating_thres=None, fmeval=False, neg_count=None,
              sampler=None, shuffle=True, split_mode="user_entry", split_ratio=None, **kwargs):
        if split_ratio is None:
            split_ratio = [0.8, 0.1, 0.1]
        self.fmeval = fmeval
        self.split_mode = split_mode
        self._init_sampler(sampler, neg_count)
        datasets = self._build(split_ratio, False, split_mode, False, binarized_rating_thres)
        # group the train split rows per user: (uid, start, end)
        train = datasets[0]
        uid_col = np.asarray(train.inter_feat.get_col(train.fuid))[train.data_index]
        order = np.argsort(uid_col, kind="stable")
        sorted_rows = train.data_index[order]
        seg = uid_col[order]
        bounds = np.hstack([[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1])
        ends = np.hstack([bounds[1:], [len(seg)]])
        train._row_pool = sorted_rows          # flat inter rows sorted by user
        train.data_index = np.stack([seg[bounds], bounds, ends], axis=1).astype(np.int64)
        return datasets

    def transpose(self) -> "ALSDataset":
        """Return a view grouped by item instead of user."""
        out = copy.copy(self)
        iid_col = np.asarray(self.inter_feat.get_col(self.fiid))[self._row_pool]
        order = np.argsort(iid_col, kind="stable")
        rows = self._row_pool[order]
        seg = iid_col[order]
        bounds = np.hstack([[0], np.flatnonzero(seg[1:] != seg[:-1]) + 1])
        ends = np.hstack([bounds[1:], [len(seg)]])
        out._row_pool = rows
        out.data_index = np.stack([seg[bounds], bounds, ends], axis=1).astype(np.int64)
        out._transposed = not getattr(self, "_transposed", False)
        out.__dict__.pop("_target_width", None)
        return out

    def _get_pos_batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        if getattr(self, "_row_pool", None) is None or self.eval_mode:
            return super()._get_pos_batch(idx)
        rows = self.data_index[idx]
        transposed = getattr(self, "_transposed", False)
        key_field = self.fiid if transposed else self.fuid
        val_field = self.fuid if transposed else self.fiid
        batch = {key_field: rows[:, 0].astype(np.int32)}
        width = self._pool_width()
        gather = rows[:, 1][:, None] + np.arange(width)[None, :]
        valid = gather < rows[:, 2][:, None]
        gather = np.where(valid, gather, 0)
        pool_rows = self._row_pool[gather]
        val_col = np.asarray(self.inter_feat.get_col(val_field))
        batch[val_field] = np.where(valid, val_col[pool_rows], 0).astype(np.int32)
        for r in self._rating_fields():
            rcol = np.asarray(self.inter_feat.get_col(r))
            batch[r] = np.where(valid, rcol[pool_rows], 0).astype(np.float32)
        return batch

    def _pool_width(self) -> int:
        key = "_pool_width_t" if getattr(self, "_transposed", False) else "_pool_width_u"
        if not hasattr(self, key):
            setattr(self, key, int((self.data_index[:, 2] - self.data_index[:, 1]).max()))
        return getattr(self, key)
