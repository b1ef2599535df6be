"""Online-serving utilities: fixed-shape batched top-k inference.

The reference has no serving layer (inference = ad-hoc `topk` calls on the
trained torch module); production TPU serving needs two things the training
eval path does not give you for free:

- STATIC shapes: every distinct request-batch shape triggers an XLA
  compile. The :class:`Predictor` pads each request up to a fixed
  ``max_batch`` so the whole service runs on exactly one compiled program.
- an explicit warmup: the first execution of a compiled program on a
  tunneled runtime can take seconds; ``warm()`` pays that cost at startup
  instead of on the first user request.

Works with any fitted :class:`~recstudio_tpu.models.basemodel.BaseRetriever`
(or one re-hydrated via ``load_checkpoint``); honors the model's
``train.ann`` setting (exact / ``approx`` / ``ivf``).

Example::

    from recstudio_tpu.serving import Predictor
    pred = Predictor(rec, max_batch=32, k=20)
    pred.warm()
    scores, items = pred({"user_id": np.array([5, 17])})
"""
from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import numpy as np


class _FixedShapeServer:
    """Shared pad-to-static-batch + latency accounting."""

    max_batch: int

    def _init_stats(self):
        self._lat_ms = []
        self.n_requests = 0

    def _pad(self, batch: Dict[str, np.ndarray]) -> Tuple[Dict, int]:
        if getattr(self, "_feat_join", None) is not None:
            batch = self._feat_join(dict(batch))
        n = len(next(iter(batch.values())))
        if n > self.max_batch:
            raise ValueError(f"request batch {n} > max_batch {self.max_batch}"
                             " — split the request")
        out = {}
        for key, value in batch.items():
            value = np.asarray(value)
            pad = [(0, self.max_batch - n)] + [(0, 0)] * (value.ndim - 1)
            out[key] = np.pad(value, pad)
        return out, n

    def _record(self, t0: float):
        self._lat_ms.append((time.time() - t0) * 1e3)
        self.n_requests += 1

    def stats(self) -> Dict[str, float]:
        lat = sorted(self._lat_ms) or [0.0]
        return {
            "requests": self.n_requests,
            "p50_ms": lat[len(lat) // 2],
            "p99_ms": lat[min(len(lat) - 1, int(len(lat) * 0.99))],
            "mean_ms": float(np.mean(lat)),
        }


class Predictor(_FixedShapeServer):
    """Fixed-shape batched top-k server for a fitted retriever."""

    def __init__(self, model, max_batch: int = 32, k: int = 20,
                 train_data=None, exclude_history: bool = True):
        self.model = model
        self.max_batch = int(max_batch)
        self.k = int(k)
        self.exclude_history = exclude_history
        # snapshot item vectors (+ ann index) from the CURRENT params —
        # always: a training-time cached item_vector is one epoch stale
        # (fit_loop refreshes BEFORE each epoch), and the ivf index is only
        # built by the inference refresh
        model._epoch_refresh(-1)
        self._topk = jax.jit(model.topk, static_argnums=(2,))
        # [num_users, H] 1-based interacted-item matrix (0 = pad), the same
        # source the eval loader uses (data/dataset.py:897-898)
        self._hist = getattr(train_data, "user_hist", None) \
            if train_data is not None else None
        self._init_stats()

    # ------------------------------------------------------------------
    def _user_hist(self, batch: Dict[str, np.ndarray]):
        if not self.exclude_history or self._hist is None:
            return None
        fuid = self.model.fuid
        if fuid not in batch:
            return None
        return np.asarray(self._hist)[np.asarray(batch[fuid])].astype(np.int32)

    # ------------------------------------------------------------------
    def warm(self):
        """Compile + first-execute the serving program on a dummy request."""
        fuid = self.model.fuid
        dummy = {fuid: np.zeros(self.max_batch, np.int32)}
        scores, items = self._call_padded(dummy)
        float(np.asarray(scores).sum())   # host read: genuinely complete
        return self

    def _call_padded(self, padded: Dict[str, np.ndarray]):
        from .models.basemodel.recommender import batch_to_device
        dev = batch_to_device(padded)
        return self._topk(self.model.params, dev, self.k,
                          self._user_hist(padded), self.model.states)

    def __call__(self, batch: Dict[str, np.ndarray]
                 ) -> Tuple[np.ndarray, np.ndarray]:
        """Serve one request: ``(scores [n, k], item ids [n, k], 1-based)``."""
        t0 = time.time()
        padded, n = self._pad(batch)
        scores, items = self._call_padded(padded)
        scores = np.asarray(scores)[:n]   # the host read is the fence
        items = np.asarray(items)[:n]
        self._record(t0)
        return scores, items


class ScorePredictor(_FixedShapeServer):
    """Fixed-shape CTR scorer for a fitted :class:`BaseRanker`.

    Pads each feature batch to ``max_batch`` (one compiled program for the
    whole service) and returns sigmoid probabilities per row.
    """

    def __init__(self, model, max_batch: int = 256, train_data=None,
                 with_sigmoid: bool = True):
        self.model = model
        self.max_batch = int(max_batch)
        self.with_sigmoid = with_sigmoid
        # joins user/item side features by id, as the training loader does
        # (data/dataset.py:_gather_entity_feats)
        self._feat_join = getattr(train_data, "_gather_entity_feats", None) \
            if train_data is not None else None
        net_state = model.states.get("net")
        self._score = jax.jit(
            lambda params, batch: model.score(params, batch,
                                              net_state=net_state))
        self._init_stats()

    def warm(self, example: Dict[str, np.ndarray]):
        padded, _ = self._pad(example)
        out = self._run(padded)
        float(np.asarray(out).sum())   # host read: genuinely complete
        return self

    def _run(self, padded):
        from .models.basemodel.recommender import batch_to_device
        return self._score(self.model.params, batch_to_device(padded))

    def __call__(self, batch: Dict[str, np.ndarray]) -> np.ndarray:
        t0 = time.time()
        padded, n = self._pad(batch)
        logits = np.asarray(self._run(padded))[:n]   # host read = fence
        if self.with_sigmoid:
            logits = 1.0 / (1.0 + np.exp(-logits))
        self._record(t0)
        return logits


def load_for_serving(checkpoint_path: str, train_data):
    """Re-hydrate a model from a full-fidelity checkpoint for inference.

    ``train_data`` is the built dataset (vocab sizes / feature schema live
    there, as in the reference's load flow, reference utils/utils.py:87-120).
    """
    import os
    import pickle

    from .utils import get_model, seed_everything
    if os.path.isdir(checkpoint_path):   # orbax directory checkpoint
        import orbax.checkpoint as ocp
        with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
            payload = dict(ckptr.restore(
                os.path.abspath(checkpoint_path),
                args=ocp.args.Composite(meta=ocp.args.JsonRestore()))["meta"])
    else:
        with open(checkpoint_path, "rb") as f:
            payload = pickle.load(f)
    model_class, _ = get_model(payload["model"])
    seed_everything(payload["config"]["train"].get("seed") or 2022)
    from .utils import set_matmul_precision
    set_matmul_precision(payload["config"]["train"].get("precision"))
    model = model_class(payload["config"])
    model._init_model(train_data)        # build nets from the data schema
    model._init_parameter(train_data)    # template params for from_bytes
    model.load_checkpoint(checkpoint_path)
    model._epoch_refresh(-1)
    return model
