"""Offline hyperparameter tuner: ``python -m recstudio_tpu.tune -m BPR``.

NNI-parity without NNI (reference ``--mode tune``, reference
utils/utils.py:197-223): samples trial configs from the NNI-format search
spaces in ``nni-experiments/search_space/<model>.yaml`` (``group/key`` keys,
``_type``: choice / uniform / loguniform / randint / quniform), runs each
trial through ``quickstart.run``, and writes a CSV leaderboard.

Modes: ``--strategy random`` (default, ``--trials N``) or ``--strategy
grid`` (cartesian product of choices; continuous ranges are discretized to
``--grid-points`` log/linear steps).
"""
from __future__ import annotations

import argparse
import csv
import itertools
import os
import time
from typing import Any, Dict, Iterator, List

import numpy as np


def _sample(spec: Dict, rng: np.random.Generator) -> Any:
    t, v = spec["_type"], spec["_value"]
    if t == "choice":
        return v[int(rng.integers(len(v)))]
    if t == "uniform":
        return float(rng.uniform(v[0], v[1]))
    if t == "loguniform":
        return float(np.exp(rng.uniform(np.log(v[0]), np.log(v[1]))))
    if t == "randint":
        return int(rng.integers(v[0], v[1]))
    if t == "quniform":
        lo, hi, q = v
        return float(np.round(rng.uniform(lo, hi) / q) * q)
    raise ValueError(f"unsupported search-space _type: {t}")


def _grid_values(spec: Dict, points: int) -> List[Any]:
    t, v = spec["_type"], spec["_value"]
    if t == "choice":
        return list(v)
    if t == "uniform":
        return [float(x) for x in np.linspace(v[0], v[1], points)]
    if t == "loguniform":
        return [float(x) for x in np.exp(np.linspace(np.log(v[0]),
                                                     np.log(v[1]), points))]
    if t == "randint":
        step = max((v[1] - v[0]) // points, 1)
        return list(range(v[0], v[1], step))
    if t == "quniform":
        lo, hi, q = v
        return [float(np.round(x / q) * q) for x in np.linspace(lo, hi, points)]
    raise ValueError(f"unsupported search-space _type: {t}")


def trial_configs(space: Dict[str, Dict], strategy: str, trials: int,
                  grid_points: int, seed: int) -> Iterator[Dict[str, Any]]:
    if strategy == "grid":
        keys = list(space)
        grids = [_grid_values(space[k], grid_points) for k in keys]
        for combo in itertools.product(*grids):
            yield dict(zip(keys, combo))
    else:
        rng = np.random.default_rng(seed)
        for _ in range(trials):
            yield {k: _sample(spec, rng) for k, spec in space.items()}


def apply_params(conf: Dict, params: Dict[str, Any]) -> Dict:
    for key, value in params.items():
        group, name = key.split("/", 1) if "/" in key else ("train", key)
        conf.setdefault(group, {})[name] = value
    return conf


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("-d", "--dataset", default="ml-100k")
    p.add_argument("--space", default=None,
                   help="search-space YAML (default: nni-experiments/"
                        "search_space/<model>.yaml)")
    p.add_argument("--strategy", choices=["random", "grid"], default="random")
    p.add_argument("--trials", type=int, default=8)
    p.add_argument("--grid-points", type=int, default=2)
    p.add_argument("--epochs", type=int, default=None,
                   help="override train.epochs for every trial")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="CSV path (default: "
                   "tune-results/<model>-<dataset>-<ts>.csv)")
    args = p.parse_args(argv)

    from .quickstart import run
    from .utils import load_yaml

    space_path = args.space or os.path.join(
        "nni-experiments", "search_space", f"{args.model.lower()}.yaml")
    if not os.path.isfile(space_path):
        raise SystemExit(f"no search space at {space_path} — pass --space")
    space = load_yaml(space_path)

    out = args.out or os.path.join(
        "tune-results",
        f"{args.model}-{args.dataset}-{time.strftime('%Y%m%d-%H%M%S')}.csv")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)

    rows = []
    param_keys = list(space)
    for i, params in enumerate(trial_configs(space, args.strategy, args.trials,
                                             args.grid_points, args.seed)):
        overrides: Dict[str, Dict] = {}
        apply_params(overrides, params)
        if args.epochs is not None:
            overrides.setdefault("train", {})["epochs"] = args.epochs
        t0 = time.time()
        _, _, result = run(args.model, args.dataset, model_config=overrides,
                           verbose=False)
        dt = time.time() - t0
        row = {**{k: params[k] for k in param_keys},
               **{k: round(float(v), 6) for k, v in (result or {}).items()},
               "wall_s": round(dt, 1), "trial": i}
        rows.append(row)
        print(f"trial {i}: {params} -> {result}")

    fields = ["trial"] + param_keys + \
        [k for k in rows[0] if k not in param_keys and k != "trial"]
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    monitor = next((k for k in rows[0]
                    if k not in param_keys and k not in ("trial", "wall_s")), None)
    if monitor:
        lower_better = any(m in monitor for m in
                           ("logloss", "mse", "mae", "rmse", "loss"))
        pick = min if lower_better else max
        best = pick(rows, key=lambda r: r.get(
            monitor, float("inf") if lower_better else float("-inf")))
        print(f"best by {monitor}: trial {best['trial']} "
              f"({ {k: best[k] for k in param_keys} }) -> {best[monitor]}")
    print(f"wrote {len(rows)} trials to {out}")
    return out


if __name__ == "__main__":
    main()
