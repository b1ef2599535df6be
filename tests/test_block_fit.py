"""Block fitting: K epochs + on-device validation per dispatch must match the
per-epoch host loop in both metrics and early-stopping bookkeeping."""
import numpy as np
import pytest

from recstudio_tpu.quickstart import run


def _overrides(block):
    return dict(
        train={"epochs": 6, "batch_size": 512, "epoch_block": block,
               "early_stop_patience": 50},
        eval={"batch_size": 128, "cutoff": [5], "val_metrics": ["ndcg"],
              "test_metrics": ["ndcg", "recall"], "topk": 20},
    )


def test_block_fit_matches_per_epoch_loop():
    rec_b, _, res_b = run("BPR", "ml-100k", model_config=_overrides(3),
                          verbose=False)
    rec_e, _, res_e = run("BPR", "ml-100k", model_config=_overrides(0),
                          verbose=False)
    # same seed + same rng schedule per epoch -> near-identical results
    # (block mode folds epoch ids from one run key; allow small tolerance)
    assert abs(res_b["ndcg@5"] - res_e["ndcg@5"]) < 0.05, (res_b, res_e)
    assert np.isfinite(res_b["recall@5"]) and res_b["recall@5"] > 0


def test_block_fit_best_epoch_tracked():
    rec, _, res = run("BPR", "ml-100k", model_config=_overrides(4),
                      verbose=False)
    assert rec.callback.best_epoch >= 0
    assert np.isfinite(rec.callback.best_value)


def test_checkpoint_resume_continues_training():
    import tempfile, os
    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.utils import get_model, seed_everything
    seed_everything(11)
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=3, batch_size=512)
    conf["eval"].update(batch_size=128, cutoff=[5], val_metrics=["ndcg"],
                        test_metrics=["ndcg"], topk=20)
    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**conf["data"])
    m1 = cls(conf)
    m1.fit(trn, val, run_mode="light")
    path = os.path.join(tempfile.mkdtemp(), "resume.ckpt")
    m1.save_checkpoint(path, epoch=2)
    # resume into more epochs: optimizer moments + rng counter restored
    conf2 = {**conf, "train": {**conf["train"], "epochs": 6}}
    m2 = cls(conf2)
    m2.fit(trn, val, run_mode="light", resume_from=path)
    assert m2._start_epoch == 3
    res = m2.evaluate(tst, verbose=False)
    import numpy as np
    assert np.isfinite(res["ndcg@5"])


def test_block_fit_stateful_sampler_midx():
    """Stateful samplers (MIDX k-means re-index) run their per-epoch refresh
    ON DEVICE inside the block jit — eligibility no longer falls back to the
    per-epoch loop."""
    over = _overrides(3)
    over["train"].update(sampler="midx-uni", sampler_num_clusters=8,
                         negative_count=2, epochs=4)
    rec, _, res = run("BPR", "ml-100k", model_config=over, verbose=False)
    assert getattr(rec, "_block_fit_fn", None) is not None, \
        "MIDX-sampled BPR should block-fit (device-side refresh)"
    assert np.isfinite(res["ndcg@5"]) and res["ndcg@5"] > 0


@pytest.mark.slow
def test_block_fit_mining_method_dns():
    """Retrieval-based negative mining (dns) consumes the per-epoch item-
    vector cache; the cache refresh now runs inside the block."""
    over = _overrides(3)
    over["train"].update(sampling_method="dns", negative_count=[10, 2],
                         epochs=4)
    rec, _, res = run("BPR", "ml-100k", model_config=over, verbose=False)
    assert getattr(rec, "_block_fit_fn", None) is not None, \
        "dns-mined BPR should block-fit (device-side item-vector refresh)"
    assert np.isfinite(res["ndcg@5"]) and res["ndcg@5"] > 0


@pytest.mark.slow
def test_block_fit_matches_loop_midx():
    """Block vs per-epoch loop for a stateful-sampler model: same engine
    semantics, so metrics land close (RNG schedules differ by design)."""
    over_b = _overrides(4)
    over_b["train"].update(sampler="midx-uni", sampler_num_clusters=8,
                           negative_count=2, epochs=4)
    over_e = _overrides(0)
    over_e["train"].update(sampler="midx-uni", sampler_num_clusters=8,
                           negative_count=2, epochs=4)
    rec_b, _, res_b = run("BPR", "ml-100k", model_config=over_b, verbose=False)
    rec_e, _, res_e = run("BPR", "ml-100k", model_config=over_e, verbose=False)
    assert getattr(rec_b, "_block_fit_fn", None) is not None
    assert getattr(rec_e, "_block_fit_fn", None) is None
    assert abs(res_b["ndcg@5"] - res_e["ndcg@5"]) < 0.06, (res_b, res_e)


def test_fixed_seed_determinism():
    """Two fits with the same seed produce identical metrics (functional
    engine + stateless PRNG schedule)."""
    r1 = run("BPR", "ml-100k", model_config=_overrides(3), verbose=False)[2]
    r2 = run("BPR", "ml-100k", model_config=_overrides(3), verbose=False)[2]
    assert r1 == r2, (r1, r2)


def test_rng_impl_knob():
    """train.rng_impl selects the root PRNG implementation; typed keys carry
    it through fold_in/split so every derived stream matches. threefry and
    rbg both train to finite, seed-deterministic metrics."""
    import jax
    from recstudio_tpu.utils import root_key

    k = root_key(7, "rbg")
    assert "rbg" in str(jax.random.key_impl(k))
    k2 = jax.random.fold_in(k, 3)
    assert "rbg" in str(jax.random.key_impl(k2))

    ov = _overrides(0)
    ov["train"]["epochs"] = 2
    ov["train"]["rng_impl"] = "threefry"
    res_t = run("BPR", "ml-100k", model_config=ov, verbose=False)[2]
    ov["train"]["rng_impl"] = "rbg"
    res_r1 = run("BPR", "ml-100k", model_config=ov, verbose=False)[2]
    res_r2 = run("BPR", "ml-100k", model_config=ov, verbose=False)[2]
    assert res_r1 == res_r2, (res_r1, res_r2)  # rbg is seed-deterministic too
    for res in (res_t, res_r1):
        assert np.isfinite(res["ndcg@5"]) and res["recall@5"] >= 0


def test_orbax_checkpoint_roundtrip_and_resume():
    """train.ckpt_backend: orbax — directory checkpoint with per-array
    sharding metadata and async save. Values round-trip exactly; resume
    restores optimizer state + rng counter + epoch like the pickle path."""
    import os
    import tempfile

    import jax
    import numpy as np

    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.utils import get_model, seed_everything

    seed_everything(11)
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=3, batch_size=512, ckpt_backend="orbax")
    conf["eval"].update(batch_size=128, cutoff=[5], val_metrics=["ndcg"],
                        test_metrics=["ndcg"], topk=20)
    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**conf["data"])
    m1 = cls(conf)
    m1.fit(trn, val, run_mode="light")
    path = os.path.join(tempfile.mkdtemp(), "resume_orbax")
    m1.save_checkpoint(path, epoch=2)
    m1.finalize_checkpoints()            # async save must land on disk
    assert os.path.isdir(path)

    # exact value round-trip into a fresh model
    m2 = cls({**conf, "train": {**conf["train"], "epochs": 6}})
    m2.fit(trn, val, run_mode="light", resume_from=path)
    assert m2._start_epoch == 3
    res = m2.evaluate(tst, verbose=False)
    assert np.isfinite(res["ndcg@5"])

    # the fit-end best checkpoint is an orbax dir too, and serving rehydrates it
    assert m1.ckpt_path is not None and os.path.isdir(m1.ckpt_path)
    from recstudio_tpu.serving import load_for_serving
    m3 = load_for_serving(m1.ckpt_path, trn)
    a = jax.tree_util.tree_leaves(m3.params)
    b = jax.tree_util.tree_leaves(m1.callback.best_params[0])
    assert all(np.allclose(np.asarray(x), np.asarray(y)) for x, y in zip(a, b))


def test_sigterm_preemption_checkpoints_and_resumes():
    """SIGTERM (cloud preemption) stops at the next epoch boundary, saves the
    usual full-fidelity checkpoint, and fit(resume_from=) continues."""
    import os
    import signal
    import threading

    import numpy as np

    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.utils import get_model, seed_everything

    seed_everything(3)
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=500, batch_size=512)
    conf["eval"].update(batch_size=128, cutoff=[5], val_metrics=["ndcg"],
                        test_metrics=["ndcg"], topk=20)
    ds = TripletDataset("ml-100k")
    trn, val, tst = ds.build(**conf["data"])
    m = cls(conf)
    timer = threading.Timer(3.0, os.kill, (os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        m.fit(trn, None, run_mode="light")   # SaveLast path, per-epoch loop
    finally:
        timer.cancel()
    assert m._preempt_requested, "SIGTERM should have landed mid-fit"
    assert m.ckpt_path is not None and os.path.exists(m.ckpt_path)

    # resume from the preemption checkpoint with a reduced epoch budget
    import pickle
    with open(m.ckpt_path, "rb") as f:
        saved_epoch = int(pickle.load(f)["epoch"])
    assert 0 <= saved_epoch < 499, "preemption should have cut the fit short"
    m2 = cls(conf)
    m2.fit(trn, None, run_mode="light", resume_from=m.ckpt_path,
           config={"train": {"epochs": saved_epoch + 3}})
    assert m2._start_epoch == saved_epoch + 1
    res = m2.evaluate(tst, verbose=False)
    assert np.isfinite(res["ndcg@5"])


def test_matmul_precision_knob():
    """train.precision maps to an EXPLICIT, BACKEND-AWARE jax matmul
    precision (utils/misc.py set_matmul_precision): the bf16_3x default is
    the ALG_DOT_BF16_BF16_F32_X3 preset on TPU but must resolve to exact
    f32 ("highest") elsewhere — XLA:CPU's ElementalIrEmitter hard-errors on
    the preset (the round-4 regression)."""
    import jax
    import pytest

    from recstudio_tpu.utils import set_matmul_precision

    on_tpu = jax.default_backend() == "tpu"
    prev = jax.config.jax_default_matmul_precision
    try:
        set_matmul_precision(None)            # framework default
        assert jax.config.jax_default_matmul_precision == "default"
        set_matmul_precision("bf16_3x")       # TPU-only preset, f32 elsewhere
        assert jax.config.jax_default_matmul_precision == (
            "BF16_BF16_F32_X3" if on_tpu else "highest")
        set_matmul_precision("bf16")
        assert jax.config.jax_default_matmul_precision == "bfloat16"
        set_matmul_precision("fp32")
        assert jax.config.jax_default_matmul_precision == "highest"
        with pytest.raises(ValueError):
            set_matmul_precision("fast")      # never an unvalidated value
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


@pytest.mark.parametrize("precision",
                         [None, "default", "bf16_3x", "bf16", "fp32"])
def test_every_precision_compiles_dot_and_fused_layer(precision):
    """EVERY legal train.precision value must compile (1) a plain jitted dot
    and (2) the fused Pallas transformer layer on the session backend.

    Regression test for round 4: bf16_3x shipped as default while (1) broke
    on XLA:CPU (Algorithm not supported: ALG_DOT_BF16_BF16_F32_X3 — the
    multichip dryrun stage 3) and (2) broke on the real TPU (Mosaic cannot
    lower a DotAlgorithmPreset: 'DotAlgorithmPreset' object is not
    subscriptable). On CPU the fused layer runs in interpret mode, so the
    TPU-side guard is the explicit precision= inside the kernels
    (ops/transformer_layer.py::_dot) plus the TPU run in scripts/ and
    BASELINE evidence."""
    import jax
    import jax.numpy as jnp

    from recstudio_tpu.ops.transformer_layer import fused_transformer_layer
    from recstudio_tpu.utils import set_matmul_precision

    set_matmul_precision(precision)           # restored by conftest fixture

    a = jnp.ones((16, 16), jnp.float32)
    assert np.isfinite(float(jax.jit(jnp.dot)(a, a).sum()))

    D, F, H, L, B = 16, 32, 2, 8, 4
    k = jax.random.PRNGKey(0)
    params = {
        "qkv_kernel": jax.random.normal(k, (D, 3 * D)) * 0.05,
        "qkv_bias": jnp.zeros((3 * D,)),
        "out_kernel": jax.random.normal(k, (D, D)) * 0.05,
        "out_bias": jnp.zeros((D,)),
        "norm1_scale": jnp.ones((D,)), "norm1_bias": jnp.zeros((D,)),
        "ffn1_kernel": jax.random.normal(k, (D, F)) * 0.05,
        "ffn1_bias": jnp.zeros((F,)),
        "ffn2_kernel": jax.random.normal(k, (F, D)) * 0.05,
        "ffn2_bias": jnp.zeros((D,)),
        "norm2_scale": jnp.ones((D,)), "norm2_bias": jnp.zeros((D,)),
    }
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, L, D))

    def f(x):
        out = fused_transformer_layer(
            x, params, key_padding_mask=None, attn_mask=None, n_head=H,
            dropout=0.1, activation="gelu", layer_norm_eps=1e-5,
            training=True, seed=jnp.int32(7))
        return out.sum()

    val, grad = jax.jit(jax.value_and_grad(f))(x)
    assert np.isfinite(float(val))
    assert np.isfinite(float(jnp.abs(grad).sum()))
