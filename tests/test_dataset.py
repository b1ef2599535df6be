"""Dataset ETL and split-semantics unit tests."""
import numpy as np
import pandas as pd
import pytest

from recstudio_tpu.data import (ALSDataset, SeqDataset, SeqToSeqDataset,
                                TripletDataset, UserDataset)


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny")
    rows = []
    # 3 users with 6/5/4 interactions, increasing timestamps
    for u, n in [("u1", 6), ("u2", 5), ("u3", 4)]:
        for i in range(n):
            rows.append((u, f"i{i}", 5.0, float(i)))
    pd.DataFrame(rows, columns=["user_id", "item_id", "rating", "timestamp"]) \
        .to_csv(d / "tiny.inter", sep="\t", index=False)
    return {
        "url": str(d),
        "inter_feat_name": "tiny.inter",
        "inter_feat_field": ["user_id:token", "item_id:token", "rating:float",
                             "timestamp:float"],
        "inter_feat_header": 0,
        "user_feat_name": None, "item_feat_name": None,
        "network_feat_name": None, "low_rating_thres": None,
    }


def test_pad_token_reserved(tiny_config):
    ds = TripletDataset("tiny", config=tiny_config)
    assert ds.field2tokens["user_id"][0] == "[PAD]"
    assert ds.field2tokens["item_id"][0] == "[PAD]"
    assert ds.num_users == 4 and ds.num_items == 7


def test_ratio_split_counts(tiny_config):
    np.random.seed(0)
    ds = TripletDataset("tiny", config=tiny_config)
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    # reference rounding: val/test get at least 1 when the user has >1 items
    assert val.data_index.shape[0] == 3 and tst.data_index.shape[0] == 3
    total = len(trn.data_index) + int((val.data_index[:, 2] - val.data_index[:, 1]).sum()) \
        + int((tst.data_index[:, 2] - tst.data_index[:, 1]).sum())
    assert total == 15


def test_user_hist_merging(tiny_config):
    np.random.seed(0)
    ds = TripletDataset("tiny", config=tiny_config)
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    # test-split hist = train hist + val hist
    assert (tst.user_count >= val.user_count).all()
    assert int(tst.user_count.sum()) == int(val.user_count.sum()) \
        + int((val.data_index[:, 2] - val.data_index[:, 1]).sum())


def test_leave_one_out_seq(tiny_config):
    cfg = dict(tiny_config, max_seq_len=4)
    ds = SeqDataset("tiny", config=cfg)
    trn, val, tst = ds.build(split_ratio=2)
    # each user contributes exactly one val and one test window
    assert val.data_index.shape[0] == 3 and tst.data_index.shape[0] == 3
    # windows never exceed max_seq_len
    assert int((trn.data_index[:, 2] - trn.data_index[:, 1]).max()) <= 4
    batch = next(iter(trn.train_loader(batch_size=4, shuffle=False)))
    assert batch["in_item_id"].shape[1] == 4
    assert (batch["seqlen"] >= 1).all()


def test_seq2seq_targets_are_shifted(tiny_config):
    cfg = dict(tiny_config, max_seq_len=4)
    ds = SeqToSeqDataset("tiny", config=cfg)
    trn, val, tst = ds.build(split_ratio=2)
    batch = next(iter(trn.train_loader(batch_size=3, shuffle=False)))
    src, tgt, lens = batch["in_item_id"], batch["item_id"], batch["seqlen"]
    for b in range(src.shape[0]):
        L = lens[b]
        assert (src[b, 1:L] == tgt[b, : L - 1]).all()


def test_user_dataset_separates_history_and_targets(tiny_config):
    np.random.seed(0)
    ds = UserDataset("tiny", config=tiny_config)
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    val.use_field = {"user_id", "item_id", "rating"}
    batch = next(iter(val.eval_loader(batch_size=3)))
    # in_ fields are the training history, targets are held-out items
    hist = batch["in_item_id"]
    tgt = batch["item_id"]
    for b in range(min(3, int(batch["_size"]))):
        real_t = tgt[b][tgt[b] > 0]
        assert not np.isin(real_t, hist[b]).any()


def test_als_dataset_transpose(tiny_config):
    np.random.seed(0)
    ds = ALSDataset("tiny", config=tiny_config)
    trn, val, tst = ds.build(split_ratio=[0.8, 0.1, 0.1])
    t = trn.transpose()
    b_u = next(iter(trn.train_loader(batch_size=3, shuffle=False)))
    b_i = next(iter(t.train_loader(batch_size=3, shuffle=False)))
    assert b_u["user_id"].ndim == 1 and b_u["item_id"].ndim == 2
    assert b_i["item_id"].ndim == 1 and b_i["user_id"].ndim == 2


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp
    from recstudio_tpu.utils import get_model
    np.random.seed(42)
    model_class, conf = get_model("BPR")
    conf["train"]["epochs"] = 1
    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**conf["data"])
    m = model_class(conf)
    m.fit(trn, None, run_mode="light")
    path = str(tmp_path / "ckpt.pkl")
    m.save_checkpoint(path, epoch=1)
    before = jnp.asarray(m.params["item_encoder"]["embedding"]).copy()
    m.params = jax.tree_util.tree_map(lambda x: x * 0, m.params)
    m.load_checkpoint(path)
    after = jnp.asarray(m.params["item_encoder"]["embedding"])
    np.testing.assert_allclose(np.asarray(before), np.asarray(after))


import jax  # noqa: E402  (used in checkpoint test)


def test_str_time_field_parsing(tmp_path):
    """gowalla-style ISO-8601 str timestamps parse into epoch-second floats."""
    import numpy as np
    from recstudio_tpu.data import TripletDataset
    rows = []
    for u in range(1, 5):
        for t, i in enumerate(range(1, 4)):
            rows.append(f"u{u}\t2010-10-0{t+1}T12:00:00Z\t0.0\t0.0\tl{i}")
    (tmp_path / "checkins.txt").write_text("\n".join(rows) + "\n")
    conf = {
        "url": None,
        "user_id_field": "user:token", "item_id_field": "location_id:token",
        "rating_field": None, "time_field": "check_in_time:str",
        "time_format": "%Y-%m-%dT%H:%M:%S%z",
        "inter_feat_name": "checkins.txt",
        "inter_feat_field": ["user:token", "check_in_time:str",
                             "latitude:float", "longitude:float",
                             "location_id:token"],
        "inter_feat_header": None,
        "user_feat_name": None, "item_feat_name": None,
        "network_feat_name": None,
        "field_separator": "\t", "min_user_inter": 0, "min_item_inter": 0,
        "max_seq_len": 5, "save_cache": False,
    }
    ds = TripletDataset("tiny-gowalla", config=conf, data_dir=str(tmp_path))
    assert ds.field2type["check_in_time"] == "float"
    trn, val, tst = ds.build(split_ratio=[0.7, 0.15, 0.15])
    col = np.asarray(trn.inter_feat.get_col("check_in_time"), dtype=np.float64)
    assert np.all(np.isfinite(col)) and col.min() > 1e9  # epoch seconds, 2010
    assert len(trn.data_index) > 0


def test_loader_combinators(ml100k_splits):
    import numpy as np
    from recstudio_tpu.data import ChainedDataLoader, CombinedLoaders
    trn = ml100k_splits[0]
    l1 = trn.train_loader(batch_size=128, shuffle=False)
    l2 = trn.train_loader(batch_size=128, shuffle=False)
    chained = ChainedDataLoader([l1, l2], nepoch=[2, 1])
    picks = [chained._current() for _ in range(3)]
    for _ in range(3):
        iter(chained)
    # schedule AAB: epochs 0,1 -> l1, epoch 2 -> l2
    assert chained._schedule.tolist() == [0, 0, 1]
    combined = CombinedLoaders([trn.train_loader(batch_size=64, shuffle=False),
                                trn.train_loader(batch_size=64, shuffle=False)])
    b = next(iter(combined))
    assert len(combined) == len(trn.train_loader(batch_size=64))
    assert "_size" in b


def test_sorted_eval_loader(ml100k_splits):
    import numpy as np
    val = ml100k_splits[1]
    loader = val.eval_loader(batch_size=32, sort_by_len=True)
    lens = []
    for batch in loader:
        tgt = batch[val.fiid]
        if tgt.ndim > 1:
            lens.extend((tgt > 0).sum(-1)[: int(batch["_size"])].tolist())
    assert lens == sorted(lens, reverse=True), "samples must be length-ordered"


def test_missing_network_feat_raises_with_guidance(tiny_config):
    """kg/social models resolve their fields via get_network_field before
    touching network_feat; a dataset built without the network must produce
    an actionable error, not the reference's bare IndexError."""
    ds = TripletDataset("tiny", config=dict(tiny_config))
    with pytest.raises(ValueError, match="network_feat_name"):
        ds.get_network_field(1, 0, 0)


def test_field2token2idx_is_dict_like(ml100k):
    """The lazy token2idx view must be API-equivalent to the reference's
    plain dicts (reference dataset.py:417-474): Mapping protocol, get(),
    re-iterable items()/values(), and dict() conversion semantics."""
    from collections.abc import Mapping

    t2i = ml100k.field2token2idx
    assert isinstance(t2i, Mapping)
    fiid = ml100k.fiid
    inner = t2i[fiid]
    tok = ml100k.field2tokens[fiid][1]
    assert inner[tok] == 1
    assert t2i.get(fiid) is inner
    assert t2i.get("no_such_field") is None
    items = t2i.items()
    assert len(list(items)) == len(t2i) == len(list(items))  # re-iterable
    assert set(t2i.keys()) == set(dict(t2i).keys())
    assert all(isinstance(v, dict) for v in t2i.values())
    with pytest.raises(KeyError):
        t2i["no_such_field"]
