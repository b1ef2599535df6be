"""Integration smokes for seq/ae/fm/graph/kg/multitask families."""
import numpy as np
import pytest

from recstudio_tpu.quickstart import run

FAST = {"train": {"epochs": 1, "batch_size": 512},
        "eval": {"batch_size": 128, "cutoff": [5], "val_metrics": ["ndcg"],
                 "test_metrics": ["ndcg", "recall"], "topk": 20}}


def _fast(extra=None):
    cfg = {k: dict(v) for k, v in FAST.items()}
    for grp, kv in (extra or {}).items():
        cfg.setdefault(grp, {}).update(kv)
    return cfg


@pytest.mark.parametrize("model", ["GRU4Rec", "SASRec", "FPMC", "HGN", "NPE",
                                   "TransRec", "STAMP", "NARM"])
def test_seq_models(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k", model_config=_fast(), verbose=False)
    assert np.isfinite(res["ndcg@5"])


@pytest.mark.parametrize("model", ["BERT4Rec"])
def test_masked_models(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k", model_config=_fast(), verbose=False)
    assert np.isfinite(res["ndcg@5"])


@pytest.mark.parametrize("model", ["MultiVAE", "MultiDAE"])
def test_ae_models(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k", model_config=_fast(), verbose=False)
    assert np.isfinite(res["ndcg@5"])


@pytest.mark.parametrize("model", ["LR", "FM", "DeepFM", "WideDeep", "DCN"])
def test_fm_models(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k",
                       model_config={"train": {"epochs": 1, "batch_size": 1024}},
                       verbose=False)
    assert np.isfinite(res["auc"]) and np.isfinite(res["logloss"])
    assert 0.0 <= res["auc"] <= 1.0


@pytest.mark.parametrize("model", ["DCNv2", "NFM", "AFM", "xDeepFM", "PNN", "AutoInt"])
def test_fm_models_2(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k",
                       model_config={"train": {"epochs": 1, "batch_size": 1024}},
                       verbose=False)
    assert np.isfinite(res["auc"])


@pytest.mark.parametrize("model", ["LightGCN", "NGCF", "SGL", "SimGCL", "NCL"])
def test_graph_models(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k",
                       model_config=_fast({"train": {"batch_size": 2048}}),
                       verbose=False)
    assert np.isfinite(res["ndcg@5"])


def test_kg_cfkg():
    np.random.seed(42)
    data_cfg = {"network_feat_name": [["social.txt"], ["ml-100k.kg", "ml-100k.link"]]}
    rec, ds, res = run("CFKG", "ml-100k",
                       model_config=_fast({"train": {"batch_size": 2048}}),
                       data_config=data_cfg, verbose=False)
    assert np.isfinite(res["ndcg@5"])


@pytest.mark.parametrize("model", ["DIN", "DIEN"])
def test_seq_rankers(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k",
                       model_config={"train": {"epochs": 1, "batch_size": 512},
                                     "eval": {"batch_size": 128}},
                       verbose=False)
    assert np.isfinite(res["auc"])


@pytest.fixture(scope="module")
def multitask_dataset(tmp_path_factory):
    """Synthetic two-rating dataset for multitask models."""
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
    config = {
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
    return config


@pytest.mark.parametrize("model", ["HardShare", "MMoE"])
def test_multitask_models(model, multitask_dataset):
    np.random.seed(42)
    rec, ds, res = run(model, "mtl", model_config={
        "train": {"epochs": 1, "batch_size": 512}},
        data_config=multitask_dataset, verbose=False)
    for r in ("click", "like"):
        assert np.isfinite(res[f"{r}_auc"])
        assert np.isfinite(res[f"{r}_logloss"])


@pytest.mark.parametrize("model", ["IPSBPR", "PDA"])
def test_debias_models(model):
    np.random.seed(42)
    rec, ds, res = run(model, "ml-100k",
                       model_config={"train": {"epochs": 2, "batch_size": 512},
                                     "eval": {"batch_size": 128, "cutoff": [5],
                                              "val_metrics": ["ndcg"],
                                              "test_metrics": ["ndcg"], "topk": 20}},
                       verbose=False)
    assert np.isfinite(res["ndcg@5"])
