"""IVF approximate-ANN index (train.ann: ivf) — the working version of the
reference's broken faiss path (build_ann_index called but never defined,
reference baseretriever.py:140; config surface basemodel.yaml:34-35)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recstudio_tpu.ann.ivf import build_ivf, ivf_search


def _recall(approx_ids, exact_ids):
    hits = 0
    for a, e in zip(approx_ids, exact_ids):
        hits += len(set(a.tolist()) & set(e.tolist()))
    return hits / exact_ids.size


def test_ivf_recall_vs_exact():
    # clustered catalog (mixture of Gaussians) — trained embedding tables are
    # low-rank/clustered, which is the regime IVF exists for; isotropic
    # noise has no structure for ANY inverted index to exploit
    N, D, B, k = 20000, 32, 64, 10
    rng = jax.random.PRNGKey(0)
    true_centers = 3.0 * jax.random.normal(rng, (50, D))
    assign = jax.random.randint(jax.random.fold_in(rng, 3), (N,), 0, 50)
    items = true_centers[assign] + \
        0.5 * jax.random.normal(jax.random.fold_in(rng, 4), (N, D))
    queries = true_centers[jax.random.randint(jax.random.fold_in(rng, 5),
                                              (B,), 0, 50)] + \
        0.5 * jax.random.normal(jax.random.fold_in(rng, 1), (B, D))
    index = build_ivf(jax.random.fold_in(rng, 2), items, num_clusters=64)
    v, ids = ivf_search(index, items, queries, k, nprobe=16)
    ev, eids = jax.lax.top_k(queries @ items.T, k)
    r = _recall(np.asarray(ids) - 1, np.asarray(eids))
    assert r >= 0.9, f"IVF recall@{k} too low: {r}"
    # returned scores must be the true inner products of the returned ids
    true = jnp.take_along_axis(queries @ items.T, ids - 1, axis=1)
    np.testing.assert_allclose(np.asarray(v), np.asarray(true), rtol=1e-4)


def test_ivf_no_item_unreachable():
    """Every item must live in some probed-able list (home or overflow)."""
    N, D = 500, 8
    items = jax.random.normal(jax.random.PRNGKey(0), (N, D))
    index = build_ivf(jax.random.PRNGKey(1), items, num_clusters=8,
                      cap_factor=0.5)  # tiny caps -> real overflow
    listed = set(np.asarray(index["lists"]).reshape(-1).tolist()) | \
        set(np.asarray(index["overflow"]).reshape(-1).tolist())
    missing = set(range(N)) - listed
    assert not missing, f"{len(missing)} items unreachable"


def test_ivf_hist_exclusion():
    N, D, B, k = 2000, 16, 8, 5
    items = jax.random.normal(jax.random.PRNGKey(0), (N, D))
    queries = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    index = build_ivf(jax.random.PRNGKey(2), items, num_clusters=16)
    _, ids0 = ivf_search(index, items, queries, k, nprobe=16)
    hist = jnp.pad(ids0[:, :2], ((0, 0), (0, 3)))  # exclude top-2, pad 0s
    _, ids1 = ivf_search(index, items, queries, k, nprobe=16, user_hist=hist)
    for b in range(B):
        banned = set(np.asarray(hist[b]).tolist()) - {0}
        got = set(np.asarray(ids1[b]).tolist())
        assert not (banned & got), f"history leaked into results: {banned & got}"


def test_approx_topk_recall():
    """`train.ann: approx` path: jax.lax.approx_max_k vs exact."""
    from recstudio_tpu.ops.topk import approx_topk
    scores = jax.random.normal(jax.random.PRNGKey(0), (64, 50000))
    av, aidx = approx_topk(scores, 20, recall_target=0.95)
    ev, eidx = jax.lax.top_k(scores, 20)
    r = _recall(np.asarray(aidx), np.asarray(eidx))
    assert r >= 0.9, f"approx recall too low: {r}"
    # returned values must be true scores of returned indices
    true = jnp.take_along_axis(scores, aidx, axis=1)
    np.testing.assert_allclose(np.asarray(av), np.asarray(true), rtol=1e-5)


def test_approx_end_to_end_bpr(ml100k_splits):
    from recstudio_tpu.utils import get_model, seed_everything
    trn, val, tst = ml100k_splits
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=3, batch_size=512, ann="approx",
                         ann_recall_target=0.95)
    conf["eval"].update(batch_size=64, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=100)
    seed_everything(5)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    res = m.evaluate(tst, verbose=False)
    assert np.isfinite(res["recall@20"]) and res["recall@20"] > 0.05


def test_ann_end_to_end_bpr(ml100k_splits):
    from recstudio_tpu.utils import get_model, seed_everything
    trn, val, tst = ml100k_splits
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=3, batch_size=512)
    conf["eval"].update(batch_size=64, cutoff=[20], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=100)
    seed_everything(5)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    m._epoch_refresh(-1)
    exact = m._eval_epoch(tst, ["recall"], cutoffs=[20])
    # enable IVF and rebuild the index + eval cache
    m.config["train"].update(ann="ivf", ann_nprobe=16, ann_clusters=32)
    m._epoch_refresh(-1)
    assert "ann" in m.states
    m._eval_cache = {}
    approx = m._eval_epoch(tst, ["recall"], cutoffs=[20])
    assert approx["recall@20"] >= 0.9 * exact["recall@20"], (approx, exact)
