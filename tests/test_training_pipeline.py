"""Batch integration test: every registered model x ml-100k x 2 epochs.

Modeled on the reference's de-facto regression suite
(reference test/test_training_pipeline.py:31-66) but with real assertions:
training must produce finite metrics and a usable topk.
"""
import numpy as np
import pytest

from recstudio_tpu.quickstart import run
from recstudio_tpu.utils import list_models

FAST_OVERRIDES = dict(
    train={"epochs": 2, "batch_size": 256},
    eval={"batch_size": 64, "cutoff": [5], "val_metrics": ["ndcg"],
          "test_metrics": ["ndcg", "recall"], "topk": 20},
)

# fast tier keeps one representative per path; the rest run in the slow
# whole-zoo tier (tests/test_zoo.py) plus the quality assertions here
_slow = pytest.mark.slow
GRADIENT_MODELS = ["BPR",
                   pytest.param("PMF", marks=_slow),
                   pytest.param("CML", marks=_slow),
                   pytest.param("LogisticMF", marks=_slow),
                   pytest.param("NCF", marks=_slow)]
CLOSED_FORM_MODELS = ["EASE",
                      pytest.param("ItemKNN", marks=_slow),
                      pytest.param("SLIM", marks=_slow),
                      pytest.param("WRMF", marks=_slow)]


@pytest.mark.parametrize("model", GRADIENT_MODELS)
def test_gradient_model_trains(model):
    np.random.seed(42)
    overrides = {k: dict(v) for k, v in FAST_OVERRIDES.items()}
    rec, datasets, result = run(model, "ml-100k", model_config=overrides,
                                verbose=False)
    assert result is not None
    for k, v in result.items():
        assert np.isfinite(v), f"{model}: {k} is not finite"
    assert result["ndcg@5"] >= 0.0


@pytest.mark.parametrize("model", CLOSED_FORM_MODELS)
def test_closed_form_model_trains(model):
    np.random.seed(42)
    overrides = {k: dict(v) for k, v in FAST_OVERRIDES.items()}
    if model == "WRMF":
        overrides["train"]["epochs"] = 4  # two full ALS sweeps
    else:
        overrides["train"]["epochs"] = 1
    rec, datasets, result = run(model, "ml-100k", model_config=overrides,
                                verbose=False)
    for k, v in result.items():
        assert np.isfinite(v), f"{model}: {k} is not finite"
    # closed-form models should be decent immediately on ml-100k
    assert result["ndcg@5"] > 0.05, f"{model} ndcg@5 too low: {result}"


def test_registry_lists_models():
    models = list_models()
    for m in ("bpr", "pmf", "ease", "wrmf"):
        assert m in models
