"""Sampler zoo tests: ranges, masking, distributions, proposal probabilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recstudio_tpu.ann.sampler import (ClusterSamplerUniform, LSHSampler,
                                       MaskedUniformSampler, MIDXSamplerPop,
                                       MIDXSamplerUniform, PopularSamplerModel,
                                       UniformSampler)

NUM_ITEMS = 101  # includes [PAD]


def test_uniform_range_and_logprob():
    s = UniformSampler(NUM_ITEMS)
    rng = jax.random.PRNGKey(0)
    q = jnp.zeros((32, 8))
    pos = jnp.ones((32,), dtype=jnp.int32)
    pos_p, neg, neg_p = s((), rng, q, 10, pos_items=pos)
    assert neg.shape == (32, 10)
    assert int(neg.min()) >= 1 and int(neg.max()) <= NUM_ITEMS - 1
    assert np.allclose(np.asarray(neg_p), 0.0)
    assert np.allclose(np.asarray(pos_p), 0.0)


def test_masked_uniform_avoids_history():
    s = MaskedUniformSampler(NUM_ITEMS)
    rng = jax.random.PRNGKey(0)
    B = 16
    hist = jnp.tile(jnp.array([[3, 7, 42, 0, 0]], dtype=jnp.int32), (B, 1))
    q = jnp.zeros((B, 8))
    neg, _ = s((), rng, q, 64, user_hist=hist)
    neg = np.asarray(neg)
    assert neg.min() >= 1 and neg.max() <= NUM_ITEMS - 1
    assert not np.isin(neg, [3, 7, 42]).any()


def test_popular_sampler_prefers_popular():
    pop = np.ones(NUM_ITEMS)
    pop[50] = 10000.0
    s = PopularSamplerModel(pop, mode=2)
    state = s.update(jax.random.PRNGKey(0), None)
    q = jnp.zeros((8, 4))
    neg, neg_p = s(state, jax.random.PRNGKey(1), q, 200)
    frac_50 = float((np.asarray(neg) == 50).mean())
    assert frac_50 > 0.5
    # log-prob consistency
    lp = np.asarray(s.compute_item_p(state, None, jnp.array([50])))
    assert lp[0] > np.log(1e-4)


@pytest.mark.parametrize("cls", [MIDXSamplerUniform, ClusterSamplerUniform])
def test_quantized_samplers_sample_valid_items(cls):
    s = cls(NUM_ITEMS, num_clusters=4)
    rng = jax.random.PRNGKey(0)
    item_embs = jax.random.normal(rng, (NUM_ITEMS - 1, 16))
    state = s.update(rng, item_embs)
    q = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    pos = jnp.arange(1, 9, dtype=jnp.int32)
    pos_p, neg, neg_p = s(state, jax.random.PRNGKey(2), q, 5, pos_items=pos)
    neg = np.asarray(neg)
    assert neg.shape == (8, 5)
    assert neg.min() >= 1 and neg.max() <= NUM_ITEMS - 1
    assert np.isfinite(np.asarray(neg_p)).all()
    assert np.isfinite(np.asarray(pos_p)).all()


def test_midx_pop_weights_buckets():
    pop = np.ones(NUM_ITEMS)
    pop[10] = 500.0
    s = MIDXSamplerPop(pop, num_clusters=4, mode=2)
    rng = jax.random.PRNGKey(0)
    item_embs = jax.random.normal(rng, (NUM_ITEMS - 1, 16))
    state = s.update(rng, item_embs)
    q = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    _, neg, neg_p = s(state, jax.random.PRNGKey(2), q, 50, pos_items=jnp.ones(4, jnp.int32))
    assert (np.asarray(neg) == 10).mean() > 0.05
    assert np.isfinite(np.asarray(neg_p)).all()


def test_lsh_sampler():
    s = LSHSampler(NUM_ITEMS, n_dims=16, n_bits=3, n_table=4)
    rng = jax.random.PRNGKey(0)
    item_embs = jax.random.normal(rng, (NUM_ITEMS - 1, 16))
    state = s.update(rng, item_embs)
    q = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    pos = jnp.arange(1, 9, dtype=jnp.int32)
    pos_p, neg, neg_p = s(state, jax.random.PRNGKey(2), q, 6, pos_items=pos)
    neg = np.asarray(neg)
    assert neg.min() >= 1 and neg.max() <= NUM_ITEMS - 1
    assert np.isfinite(np.asarray(neg_p)).all()


def test_midx_sampling_distribution_matches_proposal():
    """Empirical frequency of sampled ids should correlate with exp(compute_item_p)."""
    s = MIDXSamplerUniform(NUM_ITEMS, num_clusters=2)
    rng = jax.random.PRNGKey(0)
    item_embs = jax.random.normal(rng, (NUM_ITEMS - 1, 8)) * 0.1
    state = s.update(rng, item_embs)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 8))
    _, neg, _ = s(state, jax.random.PRNGKey(2), jnp.tile(q, (512, 1)), 32,
                  pos_items=jnp.ones(512, jnp.int32))
    counts = np.bincount(np.asarray(neg).reshape(-1), minlength=NUM_ITEMS)[1:]
    logp = np.asarray(s.compute_item_p(state, q, jnp.arange(1, NUM_ITEMS)[None, :]))[0]
    p = np.exp(logp - logp.max())
    p = p / p.sum()
    emp = counts / counts.sum()
    # loose correlation check: high-probability items should be sampled more
    corr = np.corrcoef(p, emp)[0, 1]
    assert corr > 0.5


@pytest.mark.slow
def test_retriever_sampler_protocol(ml100k_splits):
    """RetrieverSampler wraps a trained retriever as the proposal distribution
    (reference ann/sampler.py:61-78). The protocol methods
    make_sampling_state / sampling_from_state live on BaseRetriever — the
    working version of the reference's never-defined build_ann_index
    (reference baseretriever.py:140)."""
    from recstudio_tpu.ann.sampler import RetrieverSampler
    from recstudio_tpu.utils import get_model, seed_everything

    trn, val, tst = ml100k_splits
    model_class, conf = get_model("BPR")
    conf["train"].update(epochs=1, batch_size=1024)
    seed_everything(7)
    teacher = model_class(conf)
    teacher.fit(trn, None, run_mode="light")

    sampler = RetrieverSampler(trn.num_items, retriever=teacher,
                               method="brute", t=2.0)
    state = sampler.update(jax.random.PRNGKey(0))
    assert "item_vector" in state and "params" in state

    loader = trn.train_loader(batch_size=64, shuffle=False)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}
    log_pos, neg_id, log_neg = sampler(
        state, jax.random.PRNGKey(1), None, 5,
        pos_items=batch[trn.fiid], batch=batch)
    assert neg_id.shape == (64, 5)
    assert bool(jnp.all((neg_id >= 1) & (neg_id < trn.num_items)))
    # neg log-probs must equal the tempered log-softmax of the frozen scores
    q = teacher._apply(state["params"], "encode_query", batch[trn.fuid])
    scores = teacher._apply(state["params"], "score", q, state["item_vector"]) / 2.0
    expected = jnp.take_along_axis(jax.nn.log_softmax(scores, -1), neg_id - 1, -1)
    np.testing.assert_allclose(np.asarray(log_neg), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)

    # and it must drive end-to-end training as another model's negative
    # sampler (the IRGAN wiring, reference mf/irgan.py:38)
    conf2 = get_model("BPR")[1]
    conf2["train"].update(epochs=2, batch_size=512, negative_count=2)
    student = model_class(conf2, sampler=sampler)
    student.fit(trn, None, run_mode="light")
    assert np.isfinite(float(student.training_epoch(0)))
