"""Frame: a columnar, numpy-backed feature store with static-shape batching.

Plays the role of the reference's TensorFrame (recstudio/data/dataset.py:1553-1684)
but is designed for XLA: sequence columns are stored pre-padded to a fixed
max length as dense 2D int arrays (plus a ``<field>_len`` column), so any row
gather produces a fixed-shape batch ready for `jax.jit`.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np


class Frame:
    """Dict of equal-length numpy columns. Seq columns are 2D (pre-padded)."""

    def __init__(self, data: Dict[str, np.ndarray], seq_lens: Optional[Dict[str, np.ndarray]] = None):
        self._data: Dict[str, np.ndarray] = dict(data)
        # lengths of variable-length seq fields before padding
        self._seq_lens: Dict[str, np.ndarray] = dict(seq_lens or {})
        lens = {len(v) for v in self._data.values()}
        assert len(lens) <= 1, f"column length mismatch: { {k: len(v) for k, v in self._data.items()} }"
        self._length = lens.pop() if lens else 0

    # -- construction -------------------------------------------------------
    @classmethod
    def from_pandas(cls, df, field2type: Dict[str, str], pad_to: Optional[Dict[str, int]] = None) -> "Frame":
        """Convert a preprocessed DataFrame (ids already factorized) to a Frame.

        token -> int32 1D; float -> float32 1D; token_seq/float_seq -> padded 2D
        with a companion length map. ``pad_to`` fixes each seq field's width.
        """
        data, seq_lens = {}, {}
        pad_to = pad_to or {}
        for col in df.columns:
            t = field2type.get(col, "float")
            values = df[col].values
            if t.endswith("seq"):
                width = pad_to.get(col)
                if width is None:
                    width = max((len(v) for v in values), default=1) or 1
                np_dtype = np.float32 if "float" in t else np.int32
                arr = np.zeros((len(values), width), dtype=np_dtype)
                lens = np.zeros(len(values), dtype=np.int32)
                for i, v in enumerate(values):
                    n = min(len(v), width)
                    if n:
                        arr[i, :n] = np.asarray(v[-n:] if len(v) > width else v, dtype=np_dtype)
                    lens[i] = n
                data[col] = arr
                seq_lens[col] = lens
            elif t == "token":
                data[col] = np.asarray(values, dtype=np.int32)
            elif t == "float":
                data[col] = np.asarray(values, dtype=np.float32)
            else:  # str and everything else kept as object (not batched to device)
                data[col] = np.asarray(values)
        return cls(data, seq_lens)

    # -- protocol ------------------------------------------------------------
    def __len__(self) -> int:
        return self._length

    def __contains__(self, field: str) -> bool:
        return field in self._data

    @property
    def fields(self) -> List[str]:
        return list(self._data.keys())

    def get_col(self, field: str) -> np.ndarray:
        return self._data[field]

    def seq_len_col(self, field: str) -> Optional[np.ndarray]:
        return self._seq_lens.get(field)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        """Row gather: returns {field: rows} for an int/array index."""
        return {k: v[index] for k, v in self._data.items()}

    def gather(self, index, fields=None) -> Dict[str, np.ndarray]:
        fields = fields if fields is not None else self._data.keys()
        return {k: self._data[k][index] for k in fields if k in self._data}

    # -- mutation ------------------------------------------------------------
    def add_field(self, field: str, value: np.ndarray, seq_len: Optional[np.ndarray] = None):
        assert len(value) == self._length or self._length == 0
        self._data[field] = value
        if self._length == 0:
            self._length = len(value)
        if seq_len is not None:
            self._seq_lens[field] = seq_len

    def del_fields(self, keep_fields) -> "Frame":
        for f in list(self._data.keys()):
            if f not in keep_fields:
                del self._data[f]
                self._seq_lens.pop(f, None)
        return self

    def subset(self, index) -> "Frame":
        return Frame({k: v[index] for k, v in self._data.items()},
                     {k: v[index] for k, v in self._seq_lens.items()})

    def copy(self) -> "Frame":
        return Frame(dict(self._data), dict(self._seq_lens))

    # -- batching ------------------------------------------------------------
    def loader(self, batch_size: int, shuffle: bool = False,
               rng: Optional[np.random.Generator] = None) -> Iterator[Dict[str, np.ndarray]]:
        """Iterate fixed-size batches; the tail batch is padded by repeating row 0
        and carries ``_size`` with the true count."""
        n = self._length
        order = np.arange(n)
        if shuffle:
            (rng or np.random.default_rng()).shuffle(order)
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            true_size = len(idx)
            if true_size < batch_size:
                idx = np.concatenate([idx, np.zeros(batch_size - true_size, dtype=idx.dtype)])
            batch = {k: v[idx] for k, v in self._data.items()}
            batch["_size"] = np.asarray(true_size, dtype=np.int32)
            yield batch
