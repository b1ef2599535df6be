"""Measured torch-reference per-model training throughput on THIS image's CPU.

Why: bench.py needs a defensible per-model ``vs_baseline`` denominator. The
reference publishes exactly ONE throughput number (BPR/ml-100k at ~200k
examples/s on its 2022 GPU — BASELINE.md); dividing, say, a transformer at
L=200 by a BPR anchor is apples-to-oranges (BENCH_r02's "0.35x" for
SASRec@1M/L200/d128 measured the anchor mismatch, not the framework).

Protocol (documented in BASELINE.md §Per-model anchors):

    anchor(model, shape) = ref_cpu_ex_s(model, shape) * CAL
    CAL                  = 200_000 / ref_cpu_ex_s(BPR, reference shape)

i.e. the ACTUAL reference source executing the benched model at the benched
shape on this host, scaled by the one measurable CPU->reference-GPU factor.
The stated assumption — one calibration factor across shapes — understates
the reference GPU on compute-bound shapes, so BASELINE.md additionally
records the fp32 speed-of-light bound of the reference's own GPU class
(10.76 GB card ≈ RTX 2080 Ti, 13.45 TFLOP/s fp32; torch 1.12 eager runs
fp32, no AMP in the reference) as the most-generous-possible anchor.

Timing: the reference's own hot-loop semantics (zero_grad / training_step /
backward / optimizer.step — reference recommender.py:594-646) with tqdm and
logging disabled (removing them only HELPS the reference number); the
per-epoch item-vector/sampler refresh (recommender.py:560-570) runs once
before the window; warm batches excluded. The reference source is NOT
modified — same runtime shims as scripts/golden_parity.py.

Usage (each run appends saved/ref_throughput/<model>_<tag>.json):
  python scripts/ref_throughput.py --model BPR   --timed-batches 300
  python scripts/ref_throughput.py --model SASRec --timed-batches 40
  python scripts/ref_throughput.py --model SASRec --tag L200d128 \
      --embed-dim 128 --max-seq-len 200 --timed-batches 4
  python scripts/ref_throughput.py --model LightGCN --timed-batches 40
  python scripts/ref_throughput.py --model DeepFM  --timed-batches 100
  python scripts/ref_throughput.py --report   # anchor table from saved runs
"""
from __future__ import annotations

import argparse
import inspect
import json
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "saved", "ref_throughput")
PUBLISHED_BPR_GPU = 200_000.0  # BASELINE.md derived anchor


def _setup_reference(workdir: str):
    sys.path.insert(0, os.path.join(REPO, "scripts", "ref_shims"))
    sys.path.insert(0, "/root/reference")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # reference writes ./log and ./.recstudio caches here

    import numpy as np
    import torch
    torch.set_num_threads(max(1, os.cpu_count() or 1))

    from recstudio.data import dataset as refds

    # pandas>=2 copy-on-write shim — identical to scripts/golden_parity.py
    # (restores the in-place fillna semantics reference dataset.py:276-278
    # was written for; the reference source itself is untouched)
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


def measure_reference(model_name: str, batch: int | None, embed_dim: int | None,
                      max_seq_len: int | None, warm: int, timed: int) -> dict:
    _setup_reference(os.path.join(OUT, "workdir"))
    import torch
    from recstudio.utils import get_model

    model_class, conf = get_model(model_name)
    conf["train"].update(gpu=None, accelerator="cpu", num_workers=0, seed=2022)
    if batch:
        conf["train"]["batch_size"] = batch
    if embed_dim:
        conf["model"]["embed_dim"] = embed_dim
    data_conf = dict(conf.get("data") or {})
    if max_seq_len:
        data_conf["max_seq_len"] = max_seq_len

    ds = model_class._get_dataset_class()(name="ml-100k", config=data_conf)
    trn = ds.build(**conf["data"])[0]

    model = model_class(conf)
    # mirror fit() up to fit_loop (reference recommender.py:84-156), minus
    # tensorboard/callback which the training hot loop never touches
    model.logger = logging.getLogger("recstudio")
    # NOT 'tune': _accelerate forces cuda under tune (recommender.py:718-720);
    # tqdm never runs here anyway — the timed loop below is tqdm-free
    model.run_mode = "light"
    model._init_model(trn)
    model._init_parameter()
    model.val_check = False
    model._accelerate()
    model.trainloaders = model._get_train_loaders(trn)
    model.optimizers = model._get_optimizers()
    model.train()

    # once-per-epoch refresh, outside the timed window (recommender.py:560-570)
    if hasattr(model, "_update_item_vector"):
        model._update_item_vector()
    if hasattr(model, "sampler") and hasattr(model.sampler, "update"):
        model.sampler.update(item_embs=getattr(model, "item_vector", None))

    loaders, combine = model.current_epoch_trainloaders(0)
    loader = loaders[0] if isinstance(loaders, (list, tuple)) else loaders
    optimizers = model.current_epoch_optimizers(0)
    if not isinstance(optimizers, (list, tuple)):
        optimizers = [optimizers]
    step_params = inspect.signature(model.training_step).parameters

    def run_batches(n: int) -> int:
        done = 0
        while done < n:
            for batch_idx, b in enumerate(loader):
                if done >= n:
                    break
                b = model._to_device(b, model._parameter_device)
                for opt in optimizers:
                    if opt is not None:
                        opt["optimizer"].zero_grad()
                kw = {"batch": b}
                if "nepoch" in step_params:
                    kw["nepoch"] = 0
                if "batch_idx" in step_params:
                    kw["batch_idx"] = batch_idx
                loss = model.training_step(**kw)
                if isinstance(loss, dict):
                    loss = loss["loss"]
                if isinstance(loss, (list, tuple)):
                    for l in loss:
                        l.backward()
                elif isinstance(loss, torch.Tensor) and loss.requires_grad:
                    loss.backward()
                for opt in optimizers:
                    if opt is not None:
                        opt["optimizer"].step()
                done += 1
        return done

    bs = conf["train"]["batch_size"]
    run_batches(warm)
    t0 = time.time()
    n = run_batches(timed)
    dt = time.time() - t0
    return {
        "model": model_name,
        "batch_size": bs,
        "embed_dim": embed_dim or conf["model"].get("embed_dim"),
        "max_seq_len": max_seq_len,
        "timed_batches": n,
        "wall_s": round(dt, 2),
        "cpu_examples_per_s": round(n * bs / dt, 2),
        "torch_threads": torch.get_num_threads(),
    }


def report():
    recs = []
    for fn in sorted(os.listdir(OUT)):
        if fn.endswith(".json"):
            with open(os.path.join(OUT, fn)) as f:
                recs.append((fn[:-5], json.load(f)))
    bpr = next((r for name, r in recs
                if r["model"] == "BPR" and not r.get("max_seq_len")), None)
    if bpr is None:
        print("no BPR calibration run found — run --model BPR first")
        return
    cal = PUBLISHED_BPR_GPU / bpr["cpu_examples_per_s"]
    print(f"calibration: reference BPR {bpr['cpu_examples_per_s']:.0f} ex/s "
          f"on this CPU vs {PUBLISHED_BPR_GPU:.0f} published GPU -> x{cal:.1f}")
    print("| run | ref CPU ex/s | calibrated GPU-anchor ex/s |")
    print("|---|---|---|")
    anchors = {}
    for name, r in recs:
        anchor = r["cpu_examples_per_s"] * cal
        anchors[name] = round(anchor, 1)
        print(f"| {name} (bs={r['batch_size']}, d={r['embed_dim']}, "
              f"L={r.get('max_seq_len') or '-'}) "
              f"| {r['cpu_examples_per_s']:.1f} | {anchor:.0f} |")
    print(json.dumps({"calibration_factor": round(cal, 2), "anchors": anchors}))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None)
    p.add_argument("--tag", default="")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--embed-dim", type=int, default=None)
    p.add_argument("--max-seq-len", type=int, default=None)
    p.add_argument("--warm-batches", type=int, default=2)
    p.add_argument("--timed-batches", type=int, default=50)
    p.add_argument("--report", action="store_true")
    args = p.parse_args()

    os.makedirs(OUT, exist_ok=True)
    if args.report:
        report()
        return
    if not args.model:
        p.error("--model required unless --report")
    rec = measure_reference(args.model, args.batch, args.embed_dim,
                            args.max_seq_len, args.warm_batches,
                            args.timed_batches)
    tag = f"_{args.tag}" if args.tag else ""
    path = os.path.join(OUT, f"{rec['model']}{tag}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
