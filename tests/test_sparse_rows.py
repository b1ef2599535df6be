"""Row-sparse embedding engine (BaseRetriever._sparse_grad_step +
optim.row_lazy_adam): identical single-step semantics to the dense
lazy_adam path, O(batch) optimizer traffic. The dense path is the
reference semantics (torch SparseAdam, reference learner: sparse_adam).

Note: strict elementwise parity is only asserted on ONE step — over many
Adam steps the two executables' different summation orders (segment-sum
vs dense scatter-add) amplify fp rounding through sqrt(nu)+eps, so the
end-to-end check uses trajectory-level tolerances.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recstudio_tpu.models.basemodel.recommender import batch_to_device
from recstudio_tpu.models.optim import lazy_adam, row_lazy_adam
from recstudio_tpu.utils import get_model, seed_everything


def test_row_lazy_adam_matches_dense():
    """Random ids with duplicates, a PAD id, and an exact-zero-grad row must
    reproduce dense lazy_adam's update to fp precision."""
    rng = np.random.default_rng(0)
    N, D, K = 50, 8, 16
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(N, D)) * 0.1, jnp.float32)
    nu = jnp.asarray(rng.random((N, D)) * 0.01, jnp.float32)
    ids = jnp.asarray(rng.integers(0, N, size=K), jnp.int32)  # 0 = PAD
    ids = ids.at[3].set(ids[7])   # force duplicates
    g = jnp.asarray(rng.normal(size=(K, D)), jnp.float32)
    g = g.at[5].set(0.0)
    count = jnp.asarray(4, jnp.int32)

    # dense reference: scatter-add rows into a [N, D] cotangent, zero PAD,
    # then lazy_adam's update formula
    gd = jnp.zeros((N, D)).at[ids].add(g).at[0].set(0.0)
    opt = lazy_adam(1e-2)
    state = opt.init(table)._replace(count=count - 1, mu=mu, nu=nu)
    upd, new_state = opt.update(gd, state)
    want = table + upd

    t2, mu2, nu2 = row_lazy_adam(table, mu, nu, ids, g, count, 1e-2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(want),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(new_state.mu),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(nu2), np.asarray(new_state.nu),
                               rtol=1e-5, atol=1e-7)


def _build_bpr(ml100k_splits, sparse_rows, sampler="uniform", epochs=0):
    trn, val, tst = ml100k_splits
    cls, conf = get_model("BPR")
    conf["train"].update(epochs=epochs, batch_size=512, learner="sparse_adam",
                         sampler=sampler, sparse_rows=sparse_rows,
                         epoch_scan="true")
    conf["eval"].update(batch_size=128, cutoff=[5], val_metrics=["ndcg"],
                        test_metrics=["ndcg", "recall"], topk=20)
    seed_everything(7)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    return m, trn


@pytest.mark.parametrize("sampler", ["uniform", "pop"])
def test_sparse_step_matches_dense_single_step(ml100k_splits, sampler):
    """One _grad_step from identical (params, opt_state, batch, rng) must
    agree between the two execution strategies to fp precision."""
    m, trn = _build_bpr(ml100k_splits, "auto", sampler)
    assert m._sparse_rows_enabled(), "sparse path did not engage"
    batch = batch_to_device(next(iter(trn.train_loader(batch_size=512,
                                                       shuffle=False))))
    opt = m.optimizers[0]["optimizer"]
    state0 = m.opt_states[0]
    states = {"sampler": m.sampler.update(jax.random.PRNGKey(0), None)
              if sampler == "pop" else ()}
    rng = jax.random.PRNGKey(3)

    m._sparse_rows_flag = True
    p_s, s_s, l_s = m._grad_step(opt, m.params, state0, batch, rng, states)
    m._sparse_rows_flag = False
    p_d, s_d, l_d = m._grad_step(opt, m.params, state0, batch, rng, states)

    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-6)
    for p in ("item_encoder", "query_encoder"):
        np.testing.assert_allclose(
            np.asarray(p_s[p]["embedding"]), np.asarray(p_d[p]["embedding"]),
            rtol=1e-5, atol=1e-7, err_msg=p)
        np.testing.assert_allclose(
            np.asarray(s_s[0].nu[p]["embedding"]),
            np.asarray(s_d[0].nu[p]["embedding"]),
            rtol=1e-5, atol=1e-8, err_msg=p)
    assert int(s_s[0].count) == int(s_d[0].count) == 1


@pytest.mark.slow
def test_sparse_training_end_to_end(ml100k_splits):
    """Multi-epoch: both strategies train to equivalent quality (trajectory-
    level comparison; see module docstring for why not elementwise)."""
    trn, val, tst = ml100k_splits
    m_s, _ = _build_bpr(ml100k_splits, "auto", epochs=3)
    m_d, _ = _build_bpr(ml100k_splits, "false", epochs=3)
    assert m_s._sparse_rows_flag and not m_d._sparse_rows_flag
    for p in ("item_encoder", "query_encoder"):
        a = np.asarray(m_s.params[p]["embedding"])
        b = np.asarray(m_d.params[p]["embedding"])
        np.testing.assert_allclose(a, b, atol=5e-3, err_msg=p)
    r_s = m_s.evaluate(tst, verbose=False)
    r_d = m_d.evaluate(tst, verbose=False)
    assert abs(r_s["ndcg@5"] - r_d["ndcg@5"]) < 0.01, (r_s, r_d)


def test_fused_table_lazy_adam_matches_dense():
    """Mixed small/big-vocab fused table: the split update (one-hot slabs +
    blocked row scatter) must reproduce dense lazy_adam + the global-PAD-row
    zeroing of zero_pad_rows_in_grads to fp precision."""
    from recstudio_tpu.models.optim import fused_table_lazy_adam

    rng = np.random.default_rng(1)
    sizes = (40, 2000, 8, 1500)          # fields 1 and 3 take the big path
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    N, D, B = int(sum(sizes)), 8, 64
    table = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=(N, D)) * 0.1, jnp.float32)
    nu = jnp.asarray(rng.random((N, D)) * 0.01, jnp.float32)
    ids2 = np.stack([rng.integers(0, v, size=B) + o
                     for v, o in zip(sizes, offs)], axis=-1)
    ids2[0, 0] = 0                        # global [PAD] row hit
    ids2[5, 1] = ids2[9, 1]               # duplicate in a big field
    ids2 = jnp.asarray(ids2, jnp.int32)
    g = jnp.asarray(rng.normal(size=(B, len(sizes), D)), jnp.float32)
    count = jnp.asarray(3, jnp.int32)

    gd = jnp.zeros((N, D)).at[ids2.reshape(-1)].add(
        g.reshape(-1, D)).at[0].set(0.0)
    opt = lazy_adam(1e-2)
    state = opt.init(table)._replace(count=count - 1, mu=mu, nu=nu)
    upd, new_state = opt.update(gd, state)
    want = table + upd

    t2, mu2, nu2 = fused_table_lazy_adam(sizes, table, mu, nu, ids2, g,
                                         count, 1e-2)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(new_state.mu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nu2), np.asarray(new_state.nu),
                               rtol=1e-5, atol=1e-7)


@pytest.fixture(scope="module")
def ctr_small_splits():
    """Tiny criteo-layout dataset with one >1024 vocab so the fused table
    exercises BOTH update paths (one-hot slabs + blocked rows)."""
    from recstudio_tpu.data import TripletDataset
    from recstudio_tpu.data.synthetic import generate_ctr
    name, config = generate_ctr("ctr-sparse-test", 4000, seed=5, n_float=3,
                                vocabs=(1600, 300, 40, 6))
    ds = TripletDataset(name, config=config)
    return ds.build(fmeval=True, split_mode="entry",
                    split_ratio=[0.8, 0.1, 0.1])


def _build_deepfm(ctr_small_splits, sparse_rows, epochs=0):
    trn, val, tst = ctr_small_splits
    cls, conf = get_model("DeepFM")
    conf["train"].update(epochs=epochs, batch_size=256, learner="sparse_adam",
                         sparse_rows=sparse_rows, epoch_scan="true")
    conf["eval"].update(batch_size=512, val_metrics=["auc"],
                        test_metrics=["auc", "logloss"])
    seed_everything(11)
    m = cls(conf)
    m.fit(trn, None, run_mode="light")
    return m, trn


def _table_paths(m):
    return {tuple(meta["param_path"]): meta
            for meta in m._emb_probe_meta.values()}


def _align_sparse_to_dense(m_s, m_d):
    """Overwrite m_s's params with m_d's, packing the fused-table leaves
    ([N, D] -> [N, 3D] with zero moments) — makes the two models start from
    IDENTICAL parameters so trajectories are comparable. (init_parameters
    re-draws a [N, 3D] leaf differently from a [N, D] one, so same-seed
    builds do not align by themselves.)"""
    paths = _table_paths(m_s)

    def pack(path, _s_leaf, d_leaf):
        names = tuple(str(getattr(x, "key", x)) for x in path)
        if names in paths:
            z = jnp.zeros((d_leaf.shape[0], 2 * d_leaf.shape[1]),
                          d_leaf.dtype)
            return jnp.concatenate([d_leaf, z], axis=-1)
        return jnp.array(d_leaf)  # fresh buffer: both models donate params

    m_s.params = jax.tree_util.tree_map_with_path(pack, m_s.params,
                                                  m_d.params)


def _split_packed(m_s, paths_meta):
    """(params-view, mu-view, nu-view) of m_s.params with packed fused-table
    leaves split into their three column groups."""
    outs = []
    for col in range(3):
        def pick(path, leaf, col=col):
            names = tuple(str(getattr(x, "key", x)) for x in path)
            if names in paths_meta:
                d = paths_meta[names]["embed_dim"]
                return leaf[:, col * d:(col + 1) * d]
            return leaf
        outs.append(jax.tree_util.tree_map_with_path(pick, m_s.params))
    return outs


def test_ctr_sparse_step_matches_dense_single_step(ctr_small_splits):
    """One ranker _grad_step from identical state: probe-grad + packed
    fused-table row updates vs dense autodiff + optax lazy_adam."""
    m_s, trn = _build_deepfm(ctr_small_splits, "auto")
    m_d, _ = _build_deepfm(ctr_small_splits, "false")
    assert m_s._ctr_sparse_enabled(), "CTR sparse path did not engage"
    assert not m_d._ctr_sparse_enabled()
    assert any(any(v > 1024 for v in meta["sizes"])
               for meta in m_s._emb_probe_meta.values())
    _align_sparse_to_dense(m_s, m_d)
    batch = batch_to_device(next(iter(trn.train_loader(batch_size=256,
                                                       shuffle=False))))
    rng = jax.random.PRNGKey(3)

    p_s, s_s, l_s = m_s._grad_step(m_s.optimizers[0]["optimizer"], m_s.params,
                                   m_s.opt_states[0], batch, rng, m_s.states)
    p_d, s_d, l_d = m_d._grad_step(m_d.optimizers[0]["optimizer"], m_d.params,
                                   m_d.opt_states[0], batch, rng, m_d.states)

    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-6)
    paths = _table_paths(m_s)
    m_s.params = p_s
    pv = _split_packed(m_s, paths)[0]
    for got_tree, want_tree, tag in (
            (pv, p_d, "params"), (s_s[0].mu, s_d[0].mu, "mu"),
            (s_s[0].nu, s_d[0].nu, "nu")):
        fs = jax.tree_util.tree_flatten_with_path(got_tree)[0]
        fd = dict(jax.tree_util.tree_flatten_with_path(want_tree)[0])
        assert len(fs) > 4                 # tables AND mlp/linear leaves
        for kp, leaf in fs:
            names = tuple(str(getattr(x, "key", x)) for x in kp)
            if tag != "params" and names in paths:
                continue  # placeholder moments of packed leaves (below)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(fd[kp]), rtol=2e-4, atol=1e-6,
                err_msg=f"{tag}:{jax.tree_util.keystr(kp)}")
    # packed moment columns vs the dense run's moment leaves
    for names, meta in paths.items():
        for col, tree in ((1, s_d[0].mu), (2, s_d[0].nu)):
            want = tree
            for k in names:
                want = want[k]
            got = m_s.params
            for k in names:
                got = got[k]
            d = meta["embed_dim"]
            np.testing.assert_allclose(
                np.asarray(got[:, col * d:(col + 1) * d]), np.asarray(want),
                rtol=2e-4, atol=1e-6, err_msg=f"packed col {col} {names}")
    assert int(s_s[0].count) == int(s_d[0].count) == 1


def test_ctr_sparse_training_end_to_end(ctr_small_splits):
    """3 epochs sparse vs dense from IDENTICAL initial params (aligned after
    build — fit(epochs=0) initializes everything, then training_epoch drives
    the same jitted epochs without re-initializing): same trajectory within
    fp tolerance, same eval metrics."""
    trn, val, tst = ctr_small_splits
    m_s, _ = _build_deepfm(ctr_small_splits, "auto")
    m_d, _ = _build_deepfm(ctr_small_splits, "false")
    assert m_s._ctr_sparse_flag and not m_d._ctr_sparse_flag
    _align_sparse_to_dense(m_s, m_d)
    for m in (m_s, m_d):
        for i in range(3):
            m.training_epoch(i)
    paths = _table_paths(m_s)
    pv = _split_packed(m_s, paths)[0]
    fs = jax.tree_util.tree_flatten_with_path(pv)[0]
    fd = dict(jax.tree_util.tree_flatten_with_path(m_d.params)[0])
    for kp, leaf in fs:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(fd[kp]),
                                   atol=5e-3, err_msg=jax.tree_util.keystr(kp))
    r_s = m_s.evaluate(tst, verbose=False)
    r_d = m_d.evaluate(tst, verbose=False)
    assert abs(r_s["auc"] - r_d["auc"]) < 0.01, (r_s, r_d)


def test_ctr_sparse_gate_rejects_ineligible(ctr_small_splits):
    m, _ = _build_deepfm(ctr_small_splits, "auto")
    for key, val in (("learner", "adam"), ("weight_decay", 0.01),
                     ("grad_clip_norm", 1.0), ("scheduler", "exponential"),
                     ("sparse_rows", "false")):
        m.__dict__.pop("_ctr_sparse_flag", None)
        old = m.config["train"].get(key)
        m.config["train"][key] = val
        assert not m._ctr_sparse_enabled(), key
        m.config["train"][key] = old
    m.__dict__.pop("_ctr_sparse_flag", None)
    assert m._ctr_sparse_enabled()


def test_sparse_gate_rejects_ineligible(ml100k_splits):
    m, _ = _build_bpr(ml100k_splits, "auto")
    # flip configs that break lazy-adam equivalence: each must disengage
    for key, val in (("learner", "adam"), ("weight_decay", 0.01),
                     ("scheduler", "exponential"), ("sampler", "midx-uni"),
                     ("sampling_method", "dns"), ("sparse_rows", "false")):
        m.__dict__.pop("_sparse_rows_flag", None)
        old = m.config["train"].get(key)
        m.config["train"][key] = val
        if key == "sampler":
            from recstudio_tpu.ann.sampler import MIDXSamplerUniform
            old_sampler, m.sampler = m.sampler, MIDXSamplerUniform(100, 4)
        assert not m._sparse_rows_enabled(), key
        m.config["train"][key] = old
        if key == "sampler":
            m.sampler = old_sampler
    m.__dict__.pop("_sparse_rows_flag", None)
    assert m._sparse_rows_enabled()
