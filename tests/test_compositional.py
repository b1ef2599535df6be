"""Compositional model building (the reference's test_retriever.py workflow):
assemble a retriever from parts via BaseRetriever kwargs, fit and evaluate."""
import numpy as np

from recstudio_tpu.ann.sampler import PopularSamplerModel
from recstudio_tpu.data import TripletDataset
from recstudio_tpu.models.basemodel import BaseRetriever
from recstudio_tpu.models.loss_func import BinaryCrossEntropyLoss
from recstudio_tpu.models.module import Embedding
from recstudio_tpu.models.scorer import CosineScorer
from recstudio_tpu.utils import get_base_model_config, seed_everything


class _UserTowerRetriever(BaseRetriever):
    @staticmethod
    def _get_dataset_class():
        return TripletDataset

    def _get_query_encoder(self, train_data):
        return Embedding(train_data.num_users, self.embed_dim)


def test_compositional_retriever():
    seed_everything(3)
    conf = get_base_model_config()
    conf["train"].update(epochs=3, batch_size=512, negative_count=2)
    conf["eval"].update(batch_size=64, cutoff=[5], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=20)
    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**conf["data"])
    model = _UserTowerRetriever(
        conf,
        item_encoder=Embedding(ds.num_items, conf["model"]["embed_dim"]),
        scorer=CosineScorer(),
        loss=BinaryCrossEntropyLoss(),
        sampler=PopularSamplerModel(trn.item_freq),
    )
    model.fit(trn, val, run_mode="light")
    res = model.evaluate(tst, verbose=False)
    assert np.isfinite(res["ndcg@5"]) and res["recall@5"] >= 0
