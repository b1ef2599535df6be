"""Two-stage cascaded ranker: a fitted retriever supplies sampled negatives
during ranker training and stage-1 candidates at eval (reference
basemodel/baseranker.py:89-99,141-154)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from recstudio_tpu.data import TripletDataset
from recstudio_tpu.models.loss_func import BinaryCrossEntropyLoss
from recstudio_tpu.utils import get_model, seed_everything


def test_ranker_with_cascaded_retriever():
    seed_everything(42)
    bpr_cls, bpr_conf = get_model("BPR")
    bpr_conf["train"].update(epochs=2, batch_size=512)
    bpr_conf["eval"].update(topk=100, batch_size=64, cutoff=[5])

    fm_cls, fm_conf = get_model("FM")
    fm_conf["data"].update(fmeval=False, binarized_rating_thres=0.0)
    fm_conf["train"].update(epochs=2, batch_size=512, negative_count=2,
                            sampling_method="none")
    fm_conf["eval"].update(topk=20, cutoff=[5], batch_size=64,
                           val_metrics=["ndcg"],
                           test_metrics=["recall", "ndcg"])

    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**fm_conf["data"])

    retriever = bpr_cls(bpr_conf)
    retriever.fit(trn, None, run_mode="light")

    ranker = fm_cls(fm_conf, retriever=retriever,
                    loss=BinaryCrossEntropyLoss())
    ranker.fit(trn, val, run_mode="light")

    # two-stage rank-metric evaluation (retrieve -> rerank -> recall/ndcg)
    result = ranker.evaluate(tst, verbose=False)
    assert np.isfinite(result["ndcg@5"])
    assert np.isfinite(result["recall@5"])
    assert result["recall@5"] >= 0.0


def test_cascaded_ranker_block_fits():
    """Cascaded rankers are block-fit eligible: the stage-1 item-vector
    refresh runs on device inside the block jit."""
    seed_everything(7)
    bpr_cls, bpr_conf = get_model("BPR")
    bpr_conf["train"].update(epochs=2, batch_size=512)
    bpr_conf["eval"].update(topk=100, batch_size=64, cutoff=[5])

    fm_cls, fm_conf = get_model("FM")
    fm_conf["data"].update(fmeval=False, binarized_rating_thres=0.0)
    fm_conf["train"].update(epochs=4, batch_size=512, negative_count=2,
                            sampling_method="none", epoch_block=2)
    fm_conf["eval"].update(topk=20, cutoff=[5], batch_size=64,
                           val_metrics=["ndcg"],
                           test_metrics=["recall", "ndcg"])

    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**fm_conf["data"])
    retriever = bpr_cls(bpr_conf)
    retriever.fit(trn, None, run_mode="light")
    ranker = fm_cls(fm_conf, retriever=retriever,
                    loss=BinaryCrossEntropyLoss())
    ranker.fit(trn, val, run_mode="light")
    assert getattr(ranker, "_block_fit_fn", None) is not None, \
        "cascaded ranker should block-fit (device-side stage-1 refresh)"
    result = ranker.evaluate(tst, verbose=False)
    assert np.isfinite(result["ndcg@5"])
    assert np.isfinite(result["recall@5"])
