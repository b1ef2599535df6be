"""Scale proof on real hardware: ETL + train + full-catalog eval beyond ml-100k.

Runs BPR on synthetic datasets at ml-1m and ml-10m shapes (SHAPES in
data/synthetic.py) on the attached chip, both the device-resident and the
host-chunked (reduced ``device_data_budget``) paths, and prints one JSON
line per configuration: train examples/s, eval queries/s, wall times.

Usage: python scripts/scale_bench.py [ml-1m-shape ml-10m-shape ...]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scale(shape_name: str, chunked: bool = False, epochs_timed: int = 5):
    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.data.synthetic import SHAPES, generate
    from recstudio_tpu.utils import get_model, seed_everything

    n_users, n_items, n_inters = SHAPES[shape_name]
    t0 = time.time()
    name, config = generate(shape_name, n_users, n_items, n_inters, seed=7)
    t_gen = time.time() - t0

    t0 = time.time()
    ds = TripletDataset(name, config=config)
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    t_etl = time.time() - t0

    model_class, conf = get_model("BPR")
    conf["train"].update(epochs=1, batch_size=8192, benchmark_mode=True)
    conf["eval"].update(batch_size=512, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=100)
    if chunked:
        conf["train"]["device_data_budget"] = 64 << 20  # force streaming
    seed_everything(2022)
    model = model_class(conf)

    t0 = time.time()
    model.fit(trn, None, run_mode="light")
    for _ in range(2):
        loss = model.training_epoch(0)
    assert np.isfinite(float(loss))
    t_compile = time.time() - t0

    n_examples = len(trn.data_index)
    t0 = time.time()
    losses = [model.training_epoch(0) for _ in range(epochs_timed)]
    final = float(losses[-1])
    dt = time.time() - t0
    assert np.isfinite(final)
    train_eps = n_examples * epochs_timed / dt

    # full-catalog evaluation (all test users)
    model._epoch_refresh(-1)
    n_queries = len(tst.data_index)
    out = model._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[20])  # compile
    t0 = time.time()
    out = model._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[20])
    t_eval = time.time() - t0

    rec = {
        "metric": f"BPR/{shape_name}{'/chunked' if chunked else ''} train throughput",
        "value": round(train_eps, 1),
        "unit": "examples/s",
        "n_inters": n_inters,
        "n_users": n_users,
        "n_items": n_items,
        "gen_s": round(t_gen, 1),
        "etl_s": round(t_etl, 1),
        "compile_s": round(t_compile, 1),
        "epoch_s": round(dt / epochs_timed, 3),
        "eval_pass_s": round(t_eval, 3),
        "eval_qps": round(n_queries / t_eval, 1),
        "recall@20": round(out["recall@20"], 4),
        "ndcg@20": round(out["ndcg@20"], 4),
        "chunked_train": bool(getattr(model, "_chunked_epoch_fn", None)),
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_scale_seq(shape_name: str, max_seq_len: int = 200,
                  embed_dim: int = 128, epochs_timed: int = 3,
                  precision: str = "default"):
    """Transformer at scale: SASRec at production-ish shapes (L=200,
    d=128) on a synthetic catalog — exercises the fused transformer layer
    at multi-group attention tiles and the sequence ETL beyond ml-100k."""
    from recstudio_tpu.data.synthetic import SHAPES, generate
    from recstudio_tpu.utils import get_model, seed_everything

    n_users, n_items, n_inters = SHAPES[shape_name]
    name, config = generate(shape_name, n_users, n_items, n_inters, seed=7)
    config["max_seq_len"] = max_seq_len

    model_class, conf = get_model("SASRec")
    conf["model"]["embed_dim"] = embed_dim
    conf["train"].update(epochs=1, batch_size=1024, benchmark_mode=True,
                         precision=precision)
    conf["eval"].update(batch_size=256, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=100)
    seed_everything(2022)
    t0 = time.time()
    ds = model_class._get_dataset_class()(name, config=config)
    trn, val, tst = ds.build(**conf["data"])
    t_etl = time.time() - t0

    model = model_class(conf)
    t0 = time.time()
    model.fit(trn, None, run_mode="light")
    for _ in range(2):
        loss = model.training_epoch(0)
    assert np.isfinite(float(loss))
    t_compile = time.time() - t0

    n_examples = len(trn.data_index)
    t0 = time.time()
    losses = [model.training_epoch(0) for _ in range(epochs_timed)]
    final = float(losses[-1])
    dt = time.time() - t0
    assert np.isfinite(final)

    model._epoch_refresh(-1)
    n_queries = len(tst.data_index)
    out = model._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[20])  # compile
    t0 = time.time()
    out = model._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[20])
    t_eval = time.time() - t0

    rec = {
        "metric": f"SASRec/{shape_name}/L{max_seq_len}/d{embed_dim} train throughput",
        "value": round(n_examples * epochs_timed / dt, 1),
        "unit": "examples/s",
        "n_inters": n_inters,
        "seq_len": max_seq_len,
        "embed_dim": embed_dim,
        "hidden_size": conf["model"]["hidden_size"],
        "layer_num": conf["model"]["layer_num"],
        "etl_s": round(t_etl, 1),
        "compile_s": round(t_compile, 1),
        "epoch_s": round(dt / epochs_timed, 3),
        "eval_pass_s": round(t_eval, 3),
        "eval_qps": round(n_queries / t_eval, 1),
        "recall@20": round(out["recall@20"], 4),
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_scale_graph(shape_name: str = "amazon-book-shape",
                    epochs_timed: int = 3, force_ell: bool = False):
    """LightGCN past the dense-adjacency budget: whole-graph propagation per
    training step over the ELLPACK layout (graph/base.py _build_ell — padded
    gathers, symmetric-VJP backward, no scatters). The reference handles
    this size class with DGL CUDA spmm (reference module/graphmodule.py:201).
    """
    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.data.synthetic import SHAPES, generate
    from recstudio_tpu.utils import get_model, seed_everything

    n_users, n_items, n_inters = SHAPES[shape_name]
    t0 = time.time()
    name, config = generate(shape_name, n_users, n_items, n_inters, seed=7)
    t_gen = time.time() - t0

    t0 = time.time()
    ds = TripletDataset(name, config=config)
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    t_etl = time.time() - t0

    model_class, conf = get_model("LightGCN")
    conf["train"].update(epochs=1, batch_size=8192, benchmark_mode=True)
    conf["eval"].update(batch_size=512, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=100)
    seed_everything(2022)
    from recstudio_tpu.models.graph.base import BaseGraphRetriever
    old_budget = BaseGraphRetriever._DENSE_ADJ_BYTES
    if force_ell:               # smoke shapes fit the dense budget otherwise
        BaseGraphRetriever._DENSE_ADJ_BYTES = 0
    try:
        model = model_class(conf)

        t0 = time.time()
        model.fit(trn, None, run_mode="light")
    finally:
        BaseGraphRetriever._DENSE_ADJ_BYTES = old_budget
    for _ in range(2):
        loss = model.training_epoch(0)
    assert np.isfinite(float(loss))
    t_compile = time.time() - t0
    assert model._adj is None and model._prop_m is None, \
        "graph fits the dense budget — not the at-scale path"
    assert getattr(model, "_sym_spmm", None) is not None

    n_examples = len(trn.data_index)
    t0 = time.time()
    losses = [model.training_epoch(0) for _ in range(epochs_timed)]
    final = float(losses[-1])
    dt = time.time() - t0
    assert np.isfinite(final)

    model._epoch_refresh(-1)
    n_queries = len(tst.data_index)
    out = model._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[20])  # compile
    t0 = time.time()
    out = model._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[20])
    t_eval = time.time() - t0

    rec = {
        "metric": f"LightGCN/{shape_name} train throughput",
        "value": round(n_examples * epochs_timed / dt, 1),
        "unit": "examples/s",
        "n_inters": n_inters,
        "n_nodes": n_users + n_items,
        "n_edges": 2 * len(trn.data_index),
        "embed_dim": conf["model"].get("embed_dim"),
        "n_layers": conf["model"].get("n_layers"),
        "gen_s": round(t_gen, 1),
        "etl_s": round(t_etl, 1),
        "compile_s": round(t_compile, 1),
        "epoch_s": round(dt / epochs_timed, 3),
        "eval_pass_s": round(t_eval, 3),
        "eval_qps": round(n_queries / t_eval, 1),
        "recall@20": round(out["recall@20"], 4),
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_scale_ctr(shape_name: str, model: str = "DeepFM",
                  epochs_timed: int = 5, learner: str = "adam"):
    """CTR ranker at criteo shape: 13 float + 26 Zipf-token fields
    (~720k embedding rows; tens of millions under the -bigvocab shapes)
    with a PLANTED logistic signal, so the reported test AUC measures real
    learning. Exercises the fused token-table embedding gather (one offset
    gather for all 26 categorical fields) and the global-AUC ranker eval
    beyond ml-100k. ``learner='sparse_adam'`` engages the row-sparse
    fused-table optimizer (baseranker.py _ctr_sparse_grad_step)."""
    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.data.synthetic import (CTR_SHAPES, ctr_shape_vocabs,
                                              generate_ctr)
    from recstudio_tpu.utils import get_model, seed_everything

    n_rows = CTR_SHAPES.get(shape_name)
    t0 = time.time()
    if n_rows is None:   # smoke shapes: "ctr-<rows>" with default vocabs
        n_rows = int(shape_name.split("-")[1])
        name, config = generate_ctr(shape_name, n_rows, seed=11)
    else:
        name, config = generate_ctr(shape_name, n_rows, seed=11,
                                    vocabs=ctr_shape_vocabs(shape_name))
    t_gen = time.time() - t0

    t0 = time.time()
    ds = TripletDataset(name, config=config)
    trn, val, tst = ds.build(fmeval=True, split_mode="entry",
                             split_ratio=[0.8, 0.1, 0.1])
    t_etl = time.time() - t0

    model_class, conf = get_model(model)
    # 10M-row splits (1.2 GiB staged) fit HBM comfortably next to the
    # tables; raise the auto budget so the learner comparison measures
    # optimizer traffic, not host-chunk staging
    conf["train"].update(epochs=1, batch_size=8192, benchmark_mode=True,
                         learner=learner, device_data_budget=6 << 30)
    conf["eval"].update(batch_size=8192, val_metrics=["auc"],
                        test_metrics=["auc", "logloss"])
    seed_everything(2022)
    m = model_class(conf)

    t0 = time.time()
    m.fit(trn, None, run_mode="light")
    loss = float(m.training_epoch(0))
    assert np.isfinite(loss)
    t_compile = time.time() - t0

    n_examples = len(trn.data_index)
    t0 = time.time()
    losses = [m.training_epoch(0) for _ in range(epochs_timed)]
    final = float(losses[-1])
    dt = time.time() - t0
    assert np.isfinite(final)

    res = m.evaluate(tst, verbose=False)          # compile
    n_queries = len(tst.data_index)
    t0 = time.time()
    res = m.evaluate(tst, verbose=False)
    t_eval = time.time() - t0

    emb_rows = sum(int(trn.num_values(f)) for f in sorted(trn.field2type)
                   if trn.field2type.get(f) == "token")
    rec = {
        "metric": f"{model}/{shape_name} train throughput",
        "value": round(n_examples * epochs_timed / dt, 1),
        "unit": "examples/s",
        "n_rows": n_rows,
        "learner": learner,
        "emb_rows": emb_rows,
        "embed_dim": conf["model"].get("embed_dim"),
        "gen_s": round(t_gen, 1),
        "etl_s": round(t_etl, 1),
        "compile_s": round(t_compile, 1),
        "epoch_s": round(dt / epochs_timed, 3),
        "eval_pass_s": round(t_eval, 3),
        "eval_qps": round(n_queries / t_eval, 1),
        "auc": round(float(res["auc"]), 4),
        "logloss": round(float(res["logloss"]), 4),
    }
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    shapes = sys.argv[1:] or ["ml-1m-shape", "ml-10m-shape"]
    if shapes[0] == "seq":
        for s in shapes[1:] or ["ml-1m-shape"]:
            run_scale_seq(s)
    elif shapes[0] == "ctr":
        for s in shapes[1:] or ["criteo-1m-shape"]:
            run_scale_ctr(s)
    else:
        for s in shapes:
            run_scale(s)
        if "ml-10m-shape" in shapes:
            run_scale("ml-10m-shape", chunked=True)
