"""Benchmark: BPR/ml-100k training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference README quick-start log — 82,520 interactions/epoch at
0.42 s/epoch on a 2022 GPU ≈ 200k examples/s (BASELINE.md).

Measurement method: the training loop is transfer-free (losses stay on
device); the timed window dispatches K epochs and ends with a single host
read of the final loss. On remote TPU runtimes that read is the only
reliable synchronization point (block_until_ready can return before device
completion), and it transitively waits on every prior epoch through the
donated params chain — so the window covers all K epochs of real work.
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
    model.fit(trn, None, run_mode="light")  # builds + compiles (read-free)

    # warm-up: a few epochs + one read settles compile and transport mode
    for _ in range(3):
        loss = model.training_epoch(0)
    assert np.isfinite(float(loss))

    n_epochs = 50
    t0 = time.time()
    losses = [model.training_epoch(0) for _ in range(n_epochs)]
    final_loss = float(losses[-1])  # sole sync point, inside the window
    dt = time.time() - t0
    assert np.isfinite(final_loss)
    examples_per_s = n_examples * n_epochs / dt

    print(json.dumps({
        "metric": "BPR/ml-100k train throughput (1 chip)",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": round(examples_per_s / BASELINE_EXAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
