"""Shared setup for non-parametric (closed-form) retrieval models
(EASE / ItemKNN / SLIM): field bookkeeping without a flax tower."""
from __future__ import annotations


def init_linear_retriever(model, train_data):
    from ..basemodel.recommender import Recommender
    Recommender._init_model(model, train_data)
    model.num_items = train_data.num_items
    model.num_users = train_data.num_users
    model.query_fields = {model.fuid}
    model.item_fields = {model.fiid}
    model.net = None
    model.sampler = None
    model._item_feat_arrays = None
