"""Build a custom sequential retriever from framework primitives.

TPU-native counterpart of the reference custom-model walkthrough
(reference example/sasrec_demo.py): instead of subclassing torch.nn.Module,
a model here is a flax module for the query tower plus a BaseRetriever
subclass that picks its encoders, scorer, loss, and sampler. The engine
(jitted scan epochs, negative sampling, full-catalog eval) is inherited.

Run:  python examples/custom_model.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax.numpy as jnp

from recstudio_tpu.data.dataset import SeqDataset
from recstudio_tpu.models.basemodel import BaseRetriever
from recstudio_tpu.models.loss_func import BinaryCrossEntropyLoss
from recstudio_tpu.models.module import Embedding, SeqPoolingLayer, TransformerEncoder
from recstudio_tpu.models.scorer import InnerProductScorer
from recstudio_tpu.utils import get_base_model_config, seed_everything
from recstudio_tpu.utils.config import deep_update


# ----- Step 1: a custom query encoder, composed from module primitives -----
class MyQueryEncoder(nn.Module):
    """Transformer over the item-history embeddings, last-position pooled."""
    fiid: str
    embed_dim: int
    max_seq_len: int
    item_encoder: nn.Module

    @nn.compact
    def __call__(self, batch, need_pooling: bool = True, training: bool = False):
        hist = batch["in_" + self.fiid]                     # [B, L] item ids
        B, L = hist.shape
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.max_seq_len, self.embed_dim))
        x = self.item_encoder(hist) + pos[:L][None]
        out = TransformerEncoder(
            num_layers=2, d_model=self.embed_dim, n_head=2,
            dim_feedforward=4 * self.embed_dim, dropout=0.2,
            activation="gelu", layer_norm_eps=1e-12)(
                x, key_padding_mask=hist == 0,
                attn_mask=jnp.triu(jnp.ones((L, L), bool), 1),  # causal
                training=training)
        if not need_pooling:
            return out
        return SeqPoolingLayer(pooling_type="last")(out, batch["seqlen"])


# ----- Step 2: the model = encoders + scorer + loss, engine inherited -----
class MySeqModel(BaseRetriever):

    @staticmethod
    def _get_dataset_class():
        return SeqDataset

    def _get_item_encoder(self, train_data):
        return Embedding(train_data.num_items, self.embed_dim)

    def _get_query_encoder(self, train_data):
        return MyQueryEncoder(fiid=self.fiid, embed_dim=self.embed_dim,
                              max_seq_len=train_data.config["max_seq_len"],
                              item_encoder=self.item_encoder)

    def _get_score_func(self):
        return InnerProductScorer()

    def _get_loss_func(self):
        return BinaryCrossEntropyLoss()


if __name__ == "__main__":
    # Step 3: dataset ETL (cached by config hash across runs)
    conf = deep_update(get_base_model_config(), {
        "model": {"embed_dim": 64},
        "train": {"epochs": 10, "batch_size": 512, "negative_count": 1,
                  "sampler": "uniform"},
        "eval": {"batch_size": 128, "cutoff": [5, 10, 20],
                 "val_metrics": ["ndcg"], "topk": 100,
                 "test_metrics": ["recall", "ndcg"]},
    })
    ds = SeqDataset(name="ml-100k")
    trn, val, tst = ds.build(**conf["data"])

    # Step 4: fit + evaluate
    seed_everything(42)
    model = MySeqModel(conf)
    model.fit(trn, val)
    print(model.evaluate(tst))
