"""Microbenchmark: one TransformerLayer fwd+bwd at a given shape, real chip.

Isolates the encoder from ETL/embedding/loss so kernel variants can be
compared directly. Read-fenced: K steps dispatched back-to-back, one host
read of the final scalar closes the window.

  python scripts/ftl_bench.py --B 1024 --L 200 --D 128 [--prec bf16]
  RECSTUDIO_NO_FUSED_TL=1 python scripts/ftl_bench.py ...   # XLA path
  RECSTUDIO_FTL_TILES=2,1 python scripts/ftl_bench.py ...   # tile override
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=1024)
    p.add_argument("--L", type=int, default=200)
    p.add_argument("--D", type=int, default=128)
    p.add_argument("--H", type=int, default=2)
    p.add_argument("--F", type=int, default=128)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--prec", default="float32")
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from recstudio_tpu.models.module.layers import TransformerLayer

    if args.prec in ("bf16", "bfloat16"):
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    B, L, D = args.B, args.L, args.D
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(k, 1), (B, L, D), jnp.float32)
    pad = jnp.zeros((B, L), bool)
    causal = jnp.triu(jnp.ones((L, L), bool), 1)
    layers = [TransformerLayer(d_model=D, n_head=args.H,
                               dim_feedforward=args.F, dropout=args.dropout,
                               activation="gelu") for _ in range(args.layers)]
    params = [l.init({"params": jax.random.fold_in(k, 10 + i),
                      "dropout": jax.random.fold_in(k, 20 + i)},
                     x, pad, causal, True)["params"]
              for i, l in enumerate(layers)]

    def loss(params, x, key):
        h = x
        for i, l in enumerate(layers):
            h = l.apply({"params": params[i]}, h, pad, causal, True,
                        rngs={"dropout": jax.random.fold_in(key, i)})
        return (h * h).mean()

    step = jax.jit(jax.value_and_grad(loss))

    v, g = step(params, x, k)
    float(v)  # compile + transport settle
    for _ in range(3):
        v, g = step(params, x, k)
    float(v)

    t0 = time.time()
    for i in range(args.steps):
        v, g = step(params, x, jax.random.fold_in(k, i))
    final = float(v)
    dt = time.time() - t0
    ex_s = B * args.steps / dt
    tok_s = ex_s * L
    # matmul FLOPs (fwd x3 for bwd; fused path recomputes fwd again: x4)
    fwd_tok = 8 * D * D + 4 * L * D + 4 * D * args.F
    tflops3 = 3 * args.layers * L * fwd_tok * ex_s / 1e12
    print(json.dumps({
        "mode": ("xla" if os.environ.get("RECSTUDIO_NO_FUSED_TL") else "fused"),
        "tiles": os.environ.get("RECSTUDIO_FTL_TILES"),
        "prec": args.prec, "B": B, "L": L, "D": D,
        "layers": args.layers, "steps": args.steps,
        "ms_per_step": round(dt / args.steps * 1e3, 3),
        "examples_per_s": round(ex_s, 1),
        "tokens_per_s": round(tok_s, 1),
        "tflops_at_3x_fwd": round(tflops3, 2),
        "loss": final,
    }))


if __name__ == "__main__":
    main()
