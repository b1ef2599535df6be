"""Pinned, reproducible matmul-precision probe (VERDICT r4 task 6).

Round 3 claimed the UNSET jax_default_matmul_precision was pathologically
slow on this TPU runtime (a 2048^2 f32 dot at ~2.2 s) and round 4 made the
BF16_BF16_F32_X3 algorithm the process-global default on that basis — which
then broke Mosaic lowering and every non-TPU backend. This probe settles the
claim with data: N timed repeats of square f32 dots at two shapes under each
candidate setting, interleaved round-robin so a degraded-chip window shows up
as across-the-board slowness rather than biasing one setting.

Run on the real chip:  python scripts/precision_probe.py [--repeats 5]
Prints one JSON line per (shape, setting) with per-repeat ms and TFLOP/s.
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

SETTINGS = [
    ("unset", None),                      # library default (Precision.DEFAULT)
    ("default", "default"),
    ("bfloat16", "bfloat16"),
    ("bf16_3x", "BF16_BF16_F32_X3"),
    ("highest", "highest"),
]
SHAPES = [2048, 4096]


CHAIN = 32  # dots per timed sample, data-chained so they cannot overlap


def time_dot(n: int, setting, repeats: int):
    """ms per dot, averaged over a CHAIN-long dependent sequence inside one
    jit (a lax.scan whose carry feeds the next dot) — single-call timings on
    the tunneled runtime measure dispatch, not device time (they read as
    impossible >1 PFLOP/s)."""
    if setting is None:
        jax.config.update("jax_default_matmul_precision", None)
    else:
        jax.config.update("jax_default_matmul_precision", setting)
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32) * 1e-3

    @jax.jit
    def f(a, b):
        def body(c, _):
            # renormalize so the chain stays finite; the rsqrt is negligible
            c = c @ b
            return c * jax.lax.rsqrt(jnp.mean(c * c) + 1e-6), None
        return jax.lax.scan(body, a, None, length=CHAIN)[0]

    # host read = the only reliable sync on the tunneled runtime
    # (block_until_ready can return before device completion — bench.py:13)
    float(f(a, b).ravel()[0])             # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(f(a, b).ravel()[0])
        times.append((time.perf_counter() - t0) * 1e3 / CHAIN)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--rounds", type=int, default=3,
                    help="round-robin passes over all settings")
    args = ap.parse_args()

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    acc = {}
    for r in range(args.rounds):
        for n in SHAPES:
            for name, setting in SETTINGS:
                ms = time_dot(n, setting, args.repeats)
                acc.setdefault((n, name), []).extend(ms)
    for (n, name), ms in acc.items():
        best = min(ms)
        tflops = 2 * n ** 3 / (best / 1e3) / 1e12
        print(json.dumps({
            "shape": n, "setting": name, "best_ms": round(best, 3),
            "median_ms": round(sorted(ms)[len(ms) // 2], 3),
            "worst_ms": round(max(ms), 3),
            "tflops_at_best": round(tflops, 1), "n_samples": len(ms)}))


if __name__ == "__main__":
    main()
