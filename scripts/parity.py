"""Quality parity check: BPR/ml-100k across seeds vs the reference README log
(reference README.md:199-208: test NDCG@5 0.2389, Recall@5 0.1550,
NDCG@10 0.2442, Recall@10 0.2391, NDCG@20 0.2701, Recall@20 0.3530).
Run-to-run variance makes bitwise parity meaningless (different RNG/init
order); this checks the distribution across seeds covers the reference."""
import json
import sys

import numpy as np

from recstudio_tpu.quickstart import run

seeds = [int(s) for s in (sys.argv[1:] or [2022, 7, 42])]
rows = []
for seed in seeds:
    overrides = dict(
        train={"epochs": 100, "batch_size": 512, "seed": seed,
               "early_stop_patience": 10},
        eval={"batch_size": 128, "cutoff": [5, 10, 20], "val_metrics": ["ndcg"],
              "test_metrics": ["ndcg", "recall"], "topk": 100})
    rec, ds, res = run("BPR", "ml-100k", model_config=overrides, verbose=False)
    rows.append(res)
    print(json.dumps({"seed": seed, **{k: round(v, 4) for k, v in res.items()}}))

agg = {k: (float(np.mean([r[k] for r in rows])),
           float(np.std([r[k] for r in rows]))) for k in rows[0]}
print("mean±std:", {k: f"{m:.4f}±{s:.4f}" for k, (m, s) in agg.items()})
REF = {"ndcg@5": 0.2389, "recall@5": 0.1550, "ndcg@10": 0.2442,
       "recall@10": 0.2391, "ndcg@20": 0.2701, "recall@20": 0.3530}
for k, ref in REF.items():
    m, s = agg[k]
    print(f"{k}: ours {m:.4f}±{s:.4f} vs reference {ref:.4f} "
          f"({'OK' if abs(m - ref) < max(3 * s, 0.015) else 'DIVERGENT'})")
