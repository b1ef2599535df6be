"""Quickstart: train + evaluate a model in three lines.

TPU-native counterpart of the reference notebook walkthrough
(reference example/example.ipynb): load ml-100k, fit BPR, print test
metrics. Everything — ETL, negative sampling, training epochs, and the
full-catalog top-k evaluation — runs as jitted XLA programs on the
attached device (TPU if present, CPU otherwise).

Run:  python examples/quickstart.py [MODEL] [DATASET]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from recstudio_tpu.quickstart import run

model = sys.argv[1] if len(sys.argv) > 1 else "BPR"
dataset = sys.argv[2] if len(sys.argv) > 2 else "ml-100k"

rec, datasets, test_result = run(model, dataset)

print(f"\n{model} on {dataset}:")
for name, value in (test_result or {}).items():
    print(f"  {name} = {value:.4f}")

# the trained model is a plain functional object: params are a pytree in
# rec.params, and serving-style inference is `rec.predict`
import numpy as np

uid = np.asarray([1, 2, 3])
scores, items = rec.predict({rec.fuid: uid}, k=5)
print("\ntop-5 items for users 1-3:")
for u, its in zip([1, 2, 3], items.tolist()):
    print(f"  user {u}: {its}")
