"""Block fitting: K epochs + on-device validation per dispatch must match the
per-epoch host loop in both metrics and early-stopping bookkeeping."""
import numpy as np

from recstudio_tpu.quickstart import run


def _overrides(block):
    return dict(
        train={"epochs": 6, "batch_size": 512, "epoch_block": block,
               "early_stop_patience": 50},
        eval={"batch_size": 128, "cutoff": [5], "val_metrics": ["ndcg"],
              "test_metrics": ["ndcg", "recall"], "topk": 20},
    )


def test_block_fit_matches_per_epoch_loop():
    rec_b, _, res_b = run("BPR", "ml-100k", model_config=_overrides(3),
                          verbose=False)
    rec_e, _, res_e = run("BPR", "ml-100k", model_config=_overrides(0),
                          verbose=False)
    # same seed + same rng schedule per epoch -> near-identical results
    # (block mode folds epoch ids from one run key; allow small tolerance)
    assert abs(res_b["ndcg@5"] - res_e["ndcg@5"]) < 0.05, (res_b, res_e)
    assert np.isfinite(res_b["recall@5"]) and res_b["recall@5"] > 0


def test_block_fit_best_epoch_tracked():
    rec, _, res = run("BPR", "ml-100k", model_config=_overrides(4),
                      verbose=False)
    assert rec.callback.best_epoch >= 0
    assert np.isfinite(rec.callback.best_value)
