"""Batch integration test: every registered model x ml-100k x 2 epochs.

Modeled on the reference's de-facto regression suite
(reference test/test_training_pipeline.py:31-66) but with real assertions:
training must produce finite metrics and a usable topk.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from recstudio_tpu.quickstart import run
from recstudio_tpu.utils import list_models

FAST_OVERRIDES = dict(
    train={"epochs": 2, "batch_size": 256},
    eval={"batch_size": 64, "cutoff": [5], "val_metrics": ["ndcg"],
          "test_metrics": ["ndcg", "recall"], "topk": 20},
)

# fast tier keeps one representative per path; the rest run in the slow
# whole-zoo tier (tests/test_zoo.py) plus the quality assertions here
_slow = pytest.mark.slow
GRADIENT_MODELS = ["BPR",
                   pytest.param("PMF", marks=_slow),
                   pytest.param("CML", marks=_slow),
                   pytest.param("LogisticMF", marks=_slow),
                   pytest.param("NCF", marks=_slow)]
CLOSED_FORM_MODELS = ["EASE",
                      pytest.param("ItemKNN", marks=_slow),
                      pytest.param("SLIM", marks=_slow),
                      pytest.param("WRMF", marks=_slow)]


@pytest.mark.parametrize("model", GRADIENT_MODELS)
def test_gradient_model_trains(model):
    np.random.seed(42)
    overrides = {k: dict(v) for k, v in FAST_OVERRIDES.items()}
    rec, datasets, result = run(model, "ml-100k", model_config=overrides,
                                verbose=False)
    assert result is not None
    for k, v in result.items():
        assert np.isfinite(v), f"{model}: {k} is not finite"
    assert result["ndcg@5"] >= 0.0


@pytest.mark.parametrize("model", CLOSED_FORM_MODELS)
def test_closed_form_model_trains(model):
    np.random.seed(42)
    overrides = {k: dict(v) for k, v in FAST_OVERRIDES.items()}
    if model == "WRMF":
        overrides["train"]["epochs"] = 4  # two full ALS sweeps
    else:
        overrides["train"]["epochs"] = 1
    rec, datasets, result = run(model, "ml-100k", model_config=overrides,
                                verbose=False)
    for k, v in result.items():
        assert np.isfinite(v), f"{model}: {k} is not finite"
    # closed-form models should be decent immediately on ml-100k
    assert result["ndcg@5"] > 0.05, f"{model} ndcg@5 too low: {result}"


def test_registry_lists_models():
    models = list_models()
    for m in ("bpr", "pmf", "ease", "wrmf"):
        assert m in models


def test_lightgcn_collapsed_propagation_matches_layer_loop(ml100k_splits):
    """LightGCN's precomputed M = mean_l A^l operator is an exact algebraic
    rewrite of the per-layer propagation loop (the model is linear). With
    _adj folded into M at init, forcing _prop_m off exercises the edge-list
    segment-sum kernel — the path large graphs take."""
    from recstudio_tpu.utils import get_model, seed_everything

    seed_everything(7)
    cls, conf = get_model("LightGCN")
    trn = ml100k_splits[0]
    m = cls(conf)
    m._init_model(trn)
    m._init_parameter(trn)
    assert m._prop_m is not None, "ml-100k graph should fit the dense budget"
    assert m._adj is None, "dense adjacency should be freed once M is built"
    u_fast, i_fast = m.propagate(m.params)
    m._prop_m = None  # force the per-layer loop (edge-list segment-sum here)
    u_loop, i_loop = m.propagate(m.params)
    np.testing.assert_allclose(np.asarray(u_fast), np.asarray(u_loop),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(i_fast), np.asarray(i_loop),
                               rtol=2e-4, atol=2e-5)


def test_lightgcn_bf16_propagation_close_to_fp32(ml100k_splits):
    """model.prop_dtype: bf16 quantizes only M's entries (embeddings and the
    matmul accumulation stay f32): the propagated embeddings must track the
    fp32 operator within bf16 quantization error."""
    from recstudio_tpu.utils import get_model, seed_everything

    trn = ml100k_splits[0]
    outs = {}
    for dtype in ("fp32", "bf16"):
        seed_everything(7)
        cls, conf = get_model("LightGCN")
        conf["model"]["prop_dtype"] = dtype
        m = cls(conf)
        m._init_model(trn)
        m._init_parameter(trn)
        outs[dtype] = m.propagate(m.params)
    assert m._prop_m.dtype == jnp.bfloat16
    for a, b in zip(outs["fp32"], outs["bf16"]):
        a, b = np.asarray(a), np.asarray(b)
        # bf16 has ~8 mantissa bits: allow ~1% relative / small absolute slack
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=1e-4)


def test_lightgcn_ell_matches_segment_sum(ml100k_splits):
    """Past the dense budget, _gcn_layer takes the ELLPACK path (padded
    gathers + symmetric-VJP, graph/base.py _build_ell): forward must match
    the segment-sum reference and the custom VJP must match autodiff of the
    scatter formulation."""
    import jax
    from recstudio_tpu.models.graph.base import BaseGraphRetriever
    from recstudio_tpu.utils import get_model, seed_everything

    seed_everything(7)
    cls, conf = get_model("LightGCN")
    trn = ml100k_splits[0]
    old = BaseGraphRetriever._DENSE_ADJ_BYTES
    BaseGraphRetriever._DENSE_ADJ_BYTES = 0       # force ELL on ml-100k
    try:
        m = cls(conf)
        m._init_model(trn)
        m._init_parameter(trn)
    finally:
        BaseGraphRetriever._DENSE_ADJ_BYTES = old
    assert m._adj is None and m._prop_m is None
    assert getattr(m, "_sym_spmm", None) is not None
    # hub bucket must be exercised: ml-100k has nodes with deg > 128
    tables, hub_seg, _ = m._ell
    assert hub_seg is not None and hub_seg[1] > 0

    emb = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                  (m._num_nodes, 16), jnp.float32)
    src, dst = m._edges
    want = jax.ops.segment_sum(emb[src] * m._edge_w[:, None], dst,
                               num_segments=m._num_nodes,
                               indices_are_sorted=True)
    got = m._ell_apply(emb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)

    def loss_ell(e):
        return (m._sym_spmm(e) ** 2).sum()

    def loss_ref(e):
        out = jax.ops.segment_sum(e[src] * m._edge_w[:, None], dst,
                                  num_segments=m._num_nodes)
        return (out ** 2).sum()

    g_ell = jax.grad(loss_ell)(emb)
    g_ref = jax.grad(loss_ref)(emb)
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_ref),
                               rtol=3e-3, atol=3e-4)


def test_lightgcn_trains_on_ell_path(ml100k_splits):
    """End-to-end: 1 epoch of LightGCN over the ELL propagation learns
    (finite loss, finite metrics)."""
    from recstudio_tpu.models.graph.base import BaseGraphRetriever
    from recstudio_tpu.utils import get_model, seed_everything

    trn, val, tst = ml100k_splits
    seed_everything(7)
    cls, conf = get_model("LightGCN")
    conf["train"].update(epochs=1, batch_size=1024)
    conf["eval"].update(batch_size=64, cutoff=[10], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=20)
    old = BaseGraphRetriever._DENSE_ADJ_BYTES
    BaseGraphRetriever._DENSE_ADJ_BYTES = 0
    try:
        m = cls(conf)
        m.fit(trn, val, run_mode="light")
    finally:
        BaseGraphRetriever._DENSE_ADJ_BYTES = old
    res = m.evaluate(tst, verbose=False)
    assert np.isfinite(res["ndcg@10"]) and res["ndcg@10"] > 0
