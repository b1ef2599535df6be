"""Train a retriever, checkpoint it, and serve fixed-shape top-k queries.

The reference has no serving layer (its inference path is the raw torch
forward); this framework ships one (recstudio_tpu/serving.py): requests are
padded to a static batch shape so the XLA program compiles ONCE, item
vectors (and the optional ANN index) are snapshotted from the fitted
params, and per-request latency stats are tracked.

Run:  python examples/serving.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from recstudio_tpu.quickstart import run
from recstudio_tpu.serving import Predictor, load_for_serving

# ----- train a small retriever ------------------------------------------------
overrides = dict(
    train={"epochs": 8, "batch_size": 512},
    eval={"batch_size": 128, "cutoff": [10], "val_metrics": ["ndcg"],
          "test_metrics": ["ndcg", "recall"], "topk": 100},
)
rec, (trn, val, tst), result = run("BPR", "ml-100k", model_config=overrides,
                                   verbose=False)
print("test metrics:", {k: round(v, 4) for k, v in result.items()})

# ----- serve from the in-memory model ----------------------------------------
server = Predictor(rec, max_batch=32, k=10, train_data=trn,
                   exclude_history=True).warm()
users = {rec.fuid: np.asarray([1, 2, 3, 4, 5], np.int32)}
scores, items = server(users)           # [5, 10] each, item ids are 1-based
print("top-10 for user 1:", items[0].tolist())

for _ in range(20):                     # steady-state latency sample
    server(users)
print("latency stats (s):", {k: round(v, 5) for k, v in server.stats().items()})

# ----- or re-hydrate from the checkpoint the fit wrote ------------------------
if rec.ckpt_path and os.path.exists(rec.ckpt_path):
    served = load_for_serving(rec.ckpt_path, trn)
    server2 = Predictor(served, max_batch=32, k=10, train_data=trn).warm()
    scores2, items2 = server2(users)
    assert (items2 == items).all(), "checkpoint round-trip must serve identically"
    print("checkpoint re-hydration OK:", os.path.basename(rec.ckpt_path))
