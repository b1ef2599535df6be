"""Scale machinery: HBM-budget chunked train/eval paths + synthetic datasets.

The reference streams big datasets through DataLoader batching (reference
data/dataset.py:1687-1734); here small splits are staged device-resident for
the scan paths and splits over ``train.device_data_budget`` stream in
host-chunked pieces. These tests force a tiny budget on ml-100k so the
chunked paths run and must agree with the resident paths.
"""
import numpy as np
import pytest

from recstudio_tpu.utils import get_model, seed_everything

EVAL_CONF = {"batch_size": 64, "cutoff": [10], "val_metrics": ["ndcg"],
             "test_metrics": ["ndcg", "recall"], "topk": 50}


def test_chunked_eval_matches_resident(ml100k_splits):
    trn, val, tst = ml100k_splits
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=2, batch_size=512)
    conf["eval"].update(EVAL_CONF)
    seed_everything(5)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    m._epoch_refresh(-1)
    resident = m._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[10])
    # force many small chunks; results must be identical (eval is RNG-free)
    m.config["train"]["device_data_budget"] = 200_000
    m._eval_cache = {}
    chunked = m._eval_epoch(tst, ["ndcg", "recall"], cutoffs=[10])
    for k in resident:
        assert abs(resident[k] - chunked[k]) < 1e-5, (k, resident[k], chunked[k])


def test_chunked_training_path_learns(ml100k_splits):
    trn, val, tst = ml100k_splits
    cls, conf = get_model("BPR")
    # ~1.3 MB of train arrays / 100 KB budget -> dozens of chunks
    conf["train"].update(epochs=3, batch_size=512, device_data_budget=100_000)
    conf["eval"].update(EVAL_CONF)
    seed_everything(5)
    m = cls(conf)
    m.fit(trn, val, run_mode="light")
    assert getattr(m, "_chunked_epoch_fn", None) is not None, \
        "tiny budget must engage the chunked epoch path"
    res = m.evaluate(tst, verbose=False)
    assert np.isfinite(res["ndcg@10"]) and res["recall@10"] > 0.02


@pytest.mark.slow
def test_chunked_eval_ranker_global_auc():
    """Chunked eval must concatenate the per-chunk global gathers (AUC is a
    single weighted Mann-Whitney over ALL samples, not a mean of chunk AUCs)."""
    from recstudio_tpu.quickstart import run
    np.random.seed(42)
    m, datasets, _ = run("DeepFM", "ml-100k",
                         model_config={"train": {"epochs": 1, "batch_size": 1024}},
                         verbose=False)
    tst = datasets[-1]
    resident = m._eval_epoch(tst, ["auc", "logloss"], cutoffs=[10])
    m.config["train"]["device_data_budget"] = 100_000
    m._eval_cache = {}
    chunked = m._eval_epoch(tst, ["auc", "logloss"], cutoffs=[10])
    for k in resident:
        assert abs(resident[k] - chunked[k]) < 1e-4, (k, resident[k], chunked[k])


def test_synthetic_generator_end_to_end(tmp_path):
    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.data.synthetic import generate
    name, config = generate("tiny-synth", n_users=100, n_items=80,
                            n_inters=3000, out_dir=str(tmp_path), seed=1,
                            max_user_inters=200)
    config["save_cache"] = False
    ds = TripletDataset(name, config=config)
    assert ds.num_inters == 3000
    assert ds.num_users == 101 and ds.num_items == 81  # + [PAD]
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=1, batch_size=256)
    conf["eval"].update(EVAL_CONF)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    m._epoch_refresh(-1)
    res = m._eval_epoch(tst, ["ndcg"], cutoffs=[10])
    assert np.isfinite(res["ndcg@10"])


def test_compact_seq_staging_matches_expanded(tmp_path):
    """Sequence datasets stage RAW columns + data_index for the scan epoch
    and expand each batch's [L] window on device — the host-expanded
    [n, L] tensor is L× the raw split (minutes of transfer at 1M+
    interactions). Metrics must be bit-identical to the expanded path.

    Runs on a small synthetic dataset with a 1-layer SASRec: the parity
    claim is about the staging machinery, not the model size, and the
    full-size double-fit made this single test a third of the fast tier."""
    from recstudio_tpu.data.synthetic import generate

    cls, conf = get_model("SASRec")
    name, dconf = generate("staging-synth", n_users=200, n_items=127,
                           n_inters=5000, out_dir=str(tmp_path), seed=11,
                           max_user_inters=60)
    dconf["save_cache"] = False
    dconf["max_seq_len"] = 12
    conf["model"].update(embed_dim=16, layer_num=1, head_num=1)
    # tiny expanded windows would make auto pick expanded — force compact
    # to exercise the on-device expansion end to end
    conf["train"].update(epochs=2, batch_size=256, seq_staging="compact")
    conf["eval"].update(EVAL_CONF)
    seed_everything(7)
    ds = cls._get_dataset_class()(name, config=dconf)
    trn, val, tst = ds.build(**conf["data"])

    compact, batch_fn = trn.device_epoch_arrays()
    n = len(trn.data_index)
    compact_bytes = sum(np.asarray(v).nbytes for v in compact.values())
    expanded_bytes = sum(np.asarray(v).nbytes
                         for v in trn._get_pos_batch(np.arange(n)).values())
    assert compact_bytes < expanded_bytes / 3, (compact_bytes, expanded_bytes)

    # the on-device batch_fn reproduces _get_pos_batch exactly
    sel = np.arange(0, n, max(n // 97, 1))
    host = trn._get_pos_batch(sel)
    import jax.numpy as jnp
    dev = batch_fn({k: jnp.asarray(v) for k, v in compact.items()},
                   jnp.asarray(sel))
    assert set(dev) == set(host)
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k], err_msg=k)

    seed_everything(7)
    m1 = cls(conf)
    m1.fit(trn, val, run_mode="light")
    res1 = m1.evaluate(tst, verbose=False)

    seed_everything(7)
    ds2 = cls._get_dataset_class()(name, config=dconf)
    trn2, val2, tst2 = ds2.build(**conf["data"])
    trn2.device_epoch_arrays = lambda: None  # force the expanded path
    m2 = cls(conf)
    m2.fit(trn2, val2, run_mode="light")
    res2 = m2.evaluate(tst2, verbose=False)
    for k in res1:
        assert abs(res1[k] - res2[k]) < 1e-6, (k, res1[k], res2[k])


def test_compact_user_staging_matches_expanded(tmp_path):
    """UserDataset (ae family) compact staging: windows come from per-row
    dynamic_slice of the user/time-sorted raw columns, bit-identical to the
    host-expanded [n_users, max_hist] layout."""
    from recstudio_tpu.data.synthetic import generate

    cls, conf = get_model("MultiVAE")
    name, dconf = generate("staging-synth-ae", n_users=200, n_items=127,
                           n_inters=5000, out_dir=str(tmp_path), seed=11,
                           max_user_inters=60)
    dconf["save_cache"] = False
    conf["model"].update(embed_dim=32, encoder_dims=[16], decoder_dims=[16])
    conf["train"].update(epochs=2, batch_size=128, seq_staging="compact")
    conf["eval"].update(EVAL_CONF)
    seed_everything(13)
    ds = cls._get_dataset_class()(name, config=dconf)
    trn, val, tst = ds.build(**conf["data"])

    compact, batch_fn = trn.device_epoch_arrays()
    n = len(trn.data_index)
    sel = np.arange(0, n, max(n // 53, 1))
    host = trn._get_pos_batch(sel)
    import jax.numpy as jnp
    dev = batch_fn({k: jnp.asarray(v) for k, v in compact.items()},
                   jnp.asarray(sel))
    assert set(dev) == set(host)
    for k in host:
        np.testing.assert_array_equal(np.asarray(dev[k]), host[k], err_msg=k)

    seed_everything(13)
    m1 = cls(conf)
    m1.fit(trn, val, run_mode="light")
    res1 = m1.evaluate(tst, verbose=False)

    seed_everything(13)
    ds2 = cls._get_dataset_class()(name, config=dconf)
    trn2, val2, tst2 = ds2.build(**conf["data"])
    trn2.device_epoch_arrays = lambda: None  # force the expanded path
    m2 = cls(conf)
    m2.fit(trn2, val2, run_mode="light")
    res2 = m2.evaluate(tst2, verbose=False)
    for k in res1:
        assert abs(res1[k] - res2[k]) < 1e-6, (k, res1[k], res2[k])
