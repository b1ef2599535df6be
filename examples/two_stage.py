"""Two-stage retrieval + ranking cascade (retriever negatives + rerank).

Reference analog: BaseRanker with a cascaded retriever (reference
basemodel/baseranker.py:89-99,141-154) — stage 1 (a two-tower retriever)
samples training negatives and generates eval candidates; stage 2 (a CTR
ranker) scores them pairwise and reranks. Here both stages are functional
JAX models; the ranker never backprops into the retriever (its params ride
in the ranker's ``states``), and the whole cascade block-fits: the stage-1
catalog re-encode runs on device inside the epoch jit.

Run:  python examples/two_stage.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from recstudio_tpu.data import TripletDataset
from recstudio_tpu.models.loss_func import BinaryCrossEntropyLoss
from recstudio_tpu.utils import get_model, seed_everything

seed_everything(42)

# ----- stage 1: a two-tower retriever ----------------------------------------
bpr_cls, bpr_conf = get_model("BPR")
bpr_conf["train"].update(epochs=10, batch_size=512)
bpr_conf["eval"].update(topk=100, batch_size=64, cutoff=[10])

# ----- stage 2: an FM ranker over the same splits ----------------------------
fm_cls, fm_conf = get_model("FM")
fm_conf["data"].update(fmeval=False, binarized_rating_thres=0.0)
fm_conf["train"].update(epochs=10, batch_size=512, negative_count=4,
                        sampling_method="none")
fm_conf["eval"].update(topk=20, cutoff=[10], batch_size=64,
                       val_metrics=["ndcg"], test_metrics=["recall", "ndcg"])

ds = TripletDataset("ml-100k")
trn, val, tst = ds.build(**fm_conf["data"])

retriever = bpr_cls(bpr_conf)
retriever.fit(trn, None, run_mode="light")

ranker = fm_cls(fm_conf, retriever=retriever, loss=BinaryCrossEntropyLoss())
ranker.fit(trn, val, run_mode="light")

# evaluation is two-stage: retriever.topk(100) -> ranker rerank -> topk(20)
result = ranker.evaluate(tst, verbose=False)
print("two-stage test metrics:", {k: round(v, 4) for k, v in result.items()})
assert np.isfinite(result["ndcg@10"])
