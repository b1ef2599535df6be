"""Serving layer: fixed-shape Predictor + checkpoint re-hydration.

Reference has no serving path (ad-hoc topk on the torch module); this is
TPU-native capability on top of the same model API.
"""
import numpy as np
import pytest

from recstudio_tpu.serving import Predictor, load_for_serving
from recstudio_tpu.utils import get_model, seed_everything


@pytest.fixture(scope="module")
def fitted_bpr(ml100k_splits):
    trn, val, tst = ml100k_splits
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=3, batch_size=512)
    conf["eval"].update(batch_size=64, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg"], topk=100)
    seed_everything(7)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    return m, trn


def test_predictor_pads_and_unpads(fitted_bpr):
    m, trn = fitted_bpr
    pred = Predictor(m, max_batch=16, k=5, train_data=trn).warm()
    scores, items = pred({m.fuid: np.array([1, 2, 3])})
    assert scores.shape == (3, 5) and items.shape == (3, 5)
    assert (items >= 1).all() and (items < trn.num_items).all()
    # scores sorted descending per row
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    s = pred.stats()
    assert s["requests"] == 1 and s["p50_ms"] > 0


def test_predictor_matches_model_predict(fitted_bpr):
    m, trn = fitted_bpr
    pred = Predictor(m, max_batch=8, k=5, train_data=trn,
                     exclude_history=False).warm()
    uid = np.array([5, 9])
    s1, i1 = pred({m.fuid: uid})
    s2, i2 = m.predict({m.fuid: uid}, k=5)
    np.testing.assert_allclose(s1, np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(i1, np.asarray(i2))


def test_predictor_excludes_history(fitted_bpr):
    m, trn = fitted_bpr
    pred = Predictor(m, max_batch=8, k=10, train_data=trn).warm()
    uid = np.array([1, 2, 3, 4])
    _, items = pred({m.fuid: uid})
    hist = np.asarray(trn.user_hist)
    for row, u in enumerate(uid):
        seen = set(hist[u].tolist()) - {0}
        got = set(items[row].tolist())
        assert not (seen & got), f"user {u}: history leaked {seen & got}"


def test_predictor_rejects_oversize(fitted_bpr):
    m, trn = fitted_bpr
    pred = Predictor(m, max_batch=4, k=5, train_data=trn)
    with pytest.raises(ValueError):
        pred({m.fuid: np.arange(5)})


def test_ranker_score_predictor():
    from recstudio_tpu.quickstart import run
    from recstudio_tpu.serving import ScorePredictor
    m, datasets, _ = run("LR", "ml-100k",
                         model_config={"train": {"epochs": 2, "batch_size": 512}},
                         verbose=False)
    trn = datasets[0]
    # a request carries ids + context features (e.g. timestamp); user/item
    # side features are joined server-side from the dataset
    batch = {f: trn.inter_feat.get_col(f)[:7]
             for f in (m.fuid, m.fiid, "timestamp")}
    pred = ScorePredictor(m, max_batch=16, train_data=trn).warm(batch)
    p = pred(batch)
    assert p.shape == (7,)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()
    # matches the model's own predict() on the feature-joined batch
    joined = trn._gather_entity_feats(dict(batch))
    np.testing.assert_allclose(p, m.predict(joined), rtol=1e-5)
    assert pred.stats()["requests"] == 1


def test_load_for_serving_roundtrip(fitted_bpr, tmp_path):
    m, trn = fitted_bpr
    path = str(tmp_path / "bpr.ckpt")
    m.save_checkpoint(path, epoch=3)
    m2 = load_for_serving(path, trn)
    uid = np.array([11, 23])
    s1, i1 = m.predict({m.fuid: uid}, k=5)
    s2, i2 = m2.predict({m2.fuid: uid}, k=5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
