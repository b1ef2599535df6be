"""Benchmark: BPR/ml-100k training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference README quick-start log — 82,520 interactions/epoch at
0.42 s/epoch on a 2022 GPU ≈ 200k examples/s (BASELINE.md).
"""
import json
import time

import numpy as np

BASELINE_EXAMPLES_PER_S = 200_000.0


def main():
    np.random.seed(42)
    from recstudio_tpu.utils import get_model, seed_everything
    model_class, conf = get_model("BPR")
    conf["train"]["epochs"] = 1
    conf["train"]["benchmark_mode"] = True
    seed_everything(2022)

    from recstudio_tpu.data import TripletDataset
    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**conf["data"])
    n_examples = len(trn.data_index)

    model = model_class(conf)
    model.fit(trn, None, run_mode="light")  # builds + compiles + 1 epoch warmup

    # steady-state: timed scan epochs (full epoch = one device dispatch).
    # Training runs read-free (train.deferred_metrics): the loop blocks on the
    # returned device loss, never transferring it — host reads act as pipeline
    # barriers on remote TPU runtimes and are deferred to the end.
    import jax
    jax.block_until_ready(model.training_epoch(0))  # warm steady state
    n_epochs = 20
    losses = []
    t0 = time.time()
    for _ in range(n_epochs):
        losses.append(model.training_epoch(0))
    jax.block_until_ready(losses)
    dt = time.time() - t0
    examples_per_s = n_examples * n_epochs / dt
    assert np.isfinite(float(losses[-1]))  # single read, after timing

    print(json.dumps({
        "metric": "BPR/ml-100k train throughput (1 chip)",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
