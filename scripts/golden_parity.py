"""Golden metric parity: run the ACTUAL torch reference and this framework
under the same protocol on ml-100k and compare test metrics.

Round-1 parity evidence compared against the reference's published README
log only (one model, one machine, 2022). This harness produces the stronger
form: the reference itself executed in this image (CPU torch), same dataset
files, same split protocol, same early-stopping — so any metric gap is
attributable to the implementations, not to environment drift.

The reference is NOT modified. Three runtime shims make 2026-era deps work
(see scripts/ref_shims/): nni + torchmetrics stubs for unconditional imports
(reference utils/utils.py:8, eval/__init__.py:6), and a `_fill_nan`
monkeypatch — under pandas>=2 copy-on-write, the reference's
`feat[field].fillna(inplace=True)` (reference data/dataset.py:276-278) is a
silent no-op on the nullable-Int64 columns produced by `_map_all_ids`
(data/dataset.py:472), which crashes `TensorFrame.fromPandasDF`; the patch
restores the old-pandas semantics the code was written for.

Usage:
  python scripts/golden_parity.py --side ref  --model BPR --seed 2022
  python scripts/golden_parity.py --side ours --model BPR --seed 2022
  python scripts/golden_parity.py --report
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DEFAULT = os.path.join(REPO, "saved", "golden")


def _to_float(d):
    out = {}
    for k, v in d.items():
        try:
            out[k] = float(v)
        except (TypeError, ValueError):
            pass
    return out


def run_reference(model: str, seed: int, epochs: int | None, workdir: str):
    sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))
    sys.path.insert(0, "/root/reference")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # reference writes ./log and ./.recstudio caches here

    import numpy as np
    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    from recstudio.data import dataset as refds

    def _fill_nan(self, feat, mapped=False):
        for field in feat:
            ftype = self.field2type[field]
            if ftype == "float":
                feat[field] = feat[field].fillna(value=feat[field].mean())
            elif ftype == "token":
                feat[field] = feat[field].fillna(value=0 if mapped else "[PAD]")
            elif ftype == "token_seq":
                dtype = np.int64 if mapped else str
                feat[field] = feat[field].map(
                    lambda x: np.array([], dtype=dtype) if isinstance(x, float) else x)
            elif ftype == "float_seq":
                feat[field] = feat[field].map(
                    lambda x: np.array([], dtype=np.float64) if isinstance(x, float) else x)
            else:
                raise ValueError(f"unsupported field type {ftype}")

    refds.TripletDataset._fill_nan = _fill_nan

    from recstudio import quickstart
    overrides = {"train": {"gpu": None, "accelerator": "cpu",
                           "num_workers": 0, "seed": seed}}
    if epochs is not None:
        overrides["train"]["epochs"] = epochs
    t0 = time.time()
    (_, _), (val_result, test_result) = quickstart.run(
        model, "ml-100k", model_config=overrides, verbose=False)
    wall = time.time() - t0
    return _to_float(test_result), _to_float(val_result or {}), wall


def run_ours(model: str, seed: int, epochs: int | None, platform: str):
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
    sys.path.insert(0, REPO)
    os.chdir(REPO)
    from recstudio_tpu import quickstart
    overrides = {"train": {"seed": seed}}
    if epochs is not None:
        overrides["train"]["epochs"] = epochs
    t0 = time.time()
    _, _, test_result = quickstart.run(model, "ml-100k",
                                       model_config=overrides, verbose=False)
    wall = time.time() - t0
    return _to_float(test_result), {}, wall


def report(out_dir: str):
    rows = {}
    for fn in sorted(os.listdir(out_dir)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(out_dir, fn)) as f:
            rec = json.load(f)
        rows.setdefault(rec["model"], {}).setdefault(rec["side"], []).append(rec)
    import numpy as np
    for model, sides in sorted(rows.items()):
        if "ref" not in sides or "ours" not in sides:
            continue
        metrics = sorted(set(sides["ref"][0]["test"]) & set(sides["ours"][0]["test"]))
        print(f"\n## {model} (ref n={len(sides['ref'])}, ours n={len(sides['ours'])})")
        print("| metric | reference (this image) | ours | diff |")
        print("|---|---|---|---|")
        for m in metrics:
            rv = np.array([r["test"][m] for r in sides["ref"] if m in r["test"]])
            ov = np.array([r["test"][m] for r in sides["ours"] if m in r["test"]])
            print(f"| {m} | {rv.mean():.4f}±{rv.std():.4f} | "
                  f"{ov.mean():.4f}±{ov.std():.4f} | {ov.mean()-rv.mean():+.4f} |")
        rw = np.mean([r["wall_s"] for r in sides["ref"]])
        ow = np.mean([r["wall_s"] for r in sides["ours"]])
        print(f"| wall s (train+eval) | {rw:.0f} | {ow:.0f} | |")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=["ref", "ours"])
    p.add_argument("--model", default="BPR")
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--epochs", type=int, default=None,
                   help="cap epochs (default: each side's own config/early stop)")
    p.add_argument("--platform", default="",
                   help="ours only: JAX_PLATFORMS override (e.g. cpu)")
    p.add_argument("--out", default=OUT_DEFAULT)
    p.add_argument("--report", action="store_true")
    args = p.parse_args()

    if args.report:
        report(args.out)
        return
    if not args.side:
        p.error("--side required unless --report")

    os.makedirs(args.out, exist_ok=True)
    if args.side == "ref":
        test, val, wall = run_reference(
            args.model, args.seed, args.epochs,
            os.path.join(args.out, "ref_workdir"))
    else:
        test, val, wall = run_ours(args.model, args.seed, args.epochs,
                                   args.platform)
    rec = {"side": args.side, "model": args.model, "seed": args.seed,
           "epochs_cap": args.epochs, "test": test, "val": val,
           "wall_s": round(wall, 1)}
    path = os.path.join(
        args.out, f"{args.side}_{args.model}_s{args.seed}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
