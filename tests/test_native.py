"""Native k-core kernel: parity between C++ and numpy fallback, and semantics."""
import numpy as np

import recstudio_tpu.native as native


def _reference_kcore(users, items, nu, ni, mu, mi):
    ualive = np.ones(nu, bool)
    ialive = np.ones(ni, bool)
    while True:
        alive = ualive[users] & ialive[items]
        udeg = np.bincount(users[alive], minlength=nu)
        ideg = np.bincount(items[alive], minlength=ni)
        nu_a = ualive & ((udeg >= mu) | (mu <= 0))
        ni_a = ialive & ((ideg >= mi) | (mi <= 0))
        if nu_a.sum() == ualive.sum() and ni_a.sum() == ialive.sum():
            break
        ualive, ialive = nu_a, ni_a
    return ualive[users] & ialive[items]


def test_kcore_cpp_matches_reference():
    rng = np.random.default_rng(0)
    users = rng.integers(0, 200, 5000)
    items = rng.integers(0, 300, 5000)
    for mu, mi in [(5, 5), (3, 10), (0, 8), (7, 0)]:
        got = native.kcore_filter(users, items, 200, 300, mu, mi)
        want = _reference_kcore(users, items, 200, 300, mu, mi)
        np.testing.assert_array_equal(got, want)


def test_kcore_degrees_satisfied():
    rng = np.random.default_rng(1)
    users = rng.integers(0, 100, 2000)
    items = rng.integers(0, 100, 2000)
    keep = native.kcore_filter(users, items, 100, 100, 4, 4)
    if keep.any():
        u, i = users[keep], items[keep]
        assert np.bincount(u, minlength=100)[np.unique(u)].min() >= 4
        assert np.bincount(i, minlength=100)[np.unique(i)].min() >= 4


def test_cpp_library_builds():
    # the toolchain is available in this environment, so the fast path should
    # actually engage (fallback keeps correctness elsewhere)
    assert native.get_lib() is not None


def test_fast_read_csv_matches_pandas():
    import os
    import numpy as np
    import pandas as pd
    from recstudio_tpu.native import fast_read_csv
    path = os.path.join(os.path.dirname(__file__), "..", "recstudio_tpu",
                        "dataset_demo", "ml-100k", "ml-100k.inter")
    names = ["user_id", "item_id", "rating", "timestamp"]
    out = fast_read_csv(path, "\t", names, {"rating", "timestamp"}, skip_rows=1)
    if out is None:  # no compiler in env: fallback path covers it
        import pytest
        pytest.skip("native csv lib unavailable")
    df = pd.read_csv(path, sep="\t", header=0, names=names,
                     dtype={"user_id": str, "item_id": str,
                            "rating": float, "timestamp": float})
    assert len(df) == len(out["user_id"])
    assert (df["user_id"].values == out["user_id"]).all()
    assert np.allclose(df["rating"].values, out["rating"])


def test_fast_read_csv_quoting_fallback(tmp_path):
    from recstudio_tpu.native import fast_read_csv
    p = tmp_path / "q.csv"
    p.write_text('a,"x, y",1.0\n')
    assert fast_read_csv(str(p), ",", ["c1", "c2", "c3"], {"c3"}) is None
