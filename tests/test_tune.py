"""Offline tuner (reference --mode tune, reference utils/utils.py:197-223)."""
import numpy as np

from recstudio_tpu.tune import _grid_values, apply_params, trial_configs

SPACE = {
    "train/learning_rate": {"_type": "loguniform", "_value": [1e-4, 1e-2]},
    "train/weight_decay": {"_type": "choice", "_value": [0.0, 1e-3]},
    "model/embed_dim": {"_type": "choice", "_value": [32, 64]},
}


def test_grid_enumerates_cartesian_product():
    trials = list(trial_configs(SPACE, "grid", trials=0, grid_points=2, seed=0))
    assert len(trials) == 2 * 2 * 2
    lrs = sorted({t["train/learning_rate"] for t in trials})
    np.testing.assert_allclose(lrs, [1e-4, 1e-2], rtol=1e-9)


def test_random_sampling_in_bounds():
    trials = list(trial_configs(SPACE, "random", trials=16, grid_points=0,
                                seed=3))
    assert len(trials) == 16
    for t in trials:
        assert 1e-4 <= t["train/learning_rate"] <= 1e-2
        assert t["train/weight_decay"] in (0.0, 1e-3)
        assert t["model/embed_dim"] in (32, 64)
    # two seeds differ
    other = list(trial_configs(SPACE, "random", trials=16, grid_points=0,
                               seed=4))
    assert any(a != b for a, b in zip(trials, other))


def test_grid_values_types():
    assert _grid_values({"_type": "randint", "_value": [2, 10]}, 4) == \
        [2, 4, 6, 8]
    q = _grid_values({"_type": "quniform", "_value": [0.0, 1.0, 0.25]}, 5)
    assert q == [0.0, 0.25, 0.5, 0.75, 1.0]
    lg = _grid_values({"_type": "loguniform", "_value": [1e-4, 1e-2]}, 3)
    np.testing.assert_allclose(lg, [1e-4, 1e-3, 1e-2], rtol=1e-9)


def test_apply_params_nests_by_group():
    conf = {"train": {"learning_rate": 0.1}, "model": {}}
    apply_params(conf, {"train/learning_rate": 0.01, "model/embed_dim": 64,
                        "batch_size": 128})
    assert conf["train"]["learning_rate"] == 0.01
    assert conf["model"]["embed_dim"] == 64
    assert conf["train"]["batch_size"] == 128  # bare key -> train group
