"""Bisect the row-sparse CTR update's step cost at the bigvocab shape.

The ctr_bigvocab bench measured sparse_adam ~2x SLOWER per epoch than dense
Adam at 6.5M-row tables (40.7 vs 20.5 s/epoch, +20 ms/step) — the opposite
of the design intent. This harness times each piece of the sparse update in
isolation on the real chip so the regression can be attributed:

  dedup      _blocked_dedup over the 9 big fields        (argsort + segsum)
  onehot     exact small-slab aggregation                (17 one-hot matmuls)
  apply      gather + lazy-adam math + 3 scatters        (the update core)
  fused      full fused_table_lazy_adam                  (both CTR tables)
  dense      full-table dense lazy-adam leaf update      (what adam pays)

Usage: python scripts/sparse_bisect.py [--rows 6526261] [--steps 20]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench(fn, *args, steps=20, label=""):
    import jax
    import jax.numpy as jnp
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # read-fence: one 4-BYTE read closes the window. np.asarray(leaf) would
    # ship the whole table through the tunnel (~7 MB/s — a 260 MB table is
    # ~38 s, swamping the measurement); slicing on device first does not.
    fence = jax.jit(lambda o: jax.tree_util.tree_leaves(o)[0].ravel()[0])
    float(fence(out))            # warm the fence path outside the window
    t0 = time.time()
    for _ in range(steps):
        out = f(*args)
    float(fence(out))
    dt = (time.time() - t0) / steps
    print(f"{label:28s} {dt * 1e3:8.3f} ms/call")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=6_526_261)
    p.add_argument("--B", type=int, default=8192)
    p.add_argument("--D", type=int, default=10)
    p.add_argument("--steps", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from recstudio_tpu.data.synthetic import ctr_shape_vocabs
    from recstudio_tpu.models import optim

    # chip-health probe: the tunneled chip's effective speed swings >10x
    # over tens of minutes; absolute numbers are only interpretable
    # relative to this reference matmul (healthy ~1.3 ms / >100 TFLOP/s)
    k0 = jax.random.PRNGKey(1)
    a = jax.random.normal(k0, (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda x: jnp.dot(x, x, preferred_element_type=jnp.float32))
    mm(a).block_until_ready()
    t0 = time.time()
    for _ in range(30):
        out = mm(a)
    float(out.ravel()[0])
    dt = (time.time() - t0) / 30
    print(f"chip probe: {dt * 1e3:.3f} ms/4096^3 bf16 mm "
          f"({2 * 4096 ** 3 / dt / 1e12:.0f} TFLOP/s)")

    vocabs = ctr_shape_vocabs("criteo-10m-bigvocab-shape")
    # scale the per-field slabs down to the measured factorized total
    tot = sum(vocabs)
    sizes = [max(3, int(v / tot * args.rows)) for v in vocabs]
    N = sum(sizes)
    D, B = args.D, args.B
    print(f"N={N} rows, {len(sizes)} fields, "
          f"{sum(1 for v in sizes if v > 1024)} big")

    key = jax.random.PRNGKey(0)
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    ids_np = np.stack([np.random.randint(0, v, size=B) + o
                       for v, o in zip(sizes, offs)], 1)       # [B, T]
    ids2 = jnp.asarray(ids_np, jnp.int32)
    g = jax.random.normal(key, (B, len(sizes), D), jnp.float32)
    table = jax.random.normal(key, (N, D), jnp.float32) * 0.01
    mu = jnp.zeros_like(table)
    nu = jnp.zeros_like(table)
    count = jnp.ones((), jnp.int32)

    big = [t for t, v in enumerate(sizes) if v > 1024]
    bids = jnp.stack([ids2[:, t] for t in big], 0)
    bg = jnp.stack([g[:, t, :] for t in big], 0)

    bench(lambda a, b: optim._blocked_dedup(a, b), bids, bg,
          steps=args.steps, label="dedup (9 big fields)")

    def onehot_agg(ids2, g):
        parts = []
        for t, v in enumerate(sizes):
            if v > 1024:
                continue
            off = int(offs[t])
            rel = ids2[:, t] - off
            onehot = (rel[None, :] == jnp.arange(v, dtype=rel.dtype)[:, None])
            parts.append(jnp.dot(onehot.astype(g.dtype), g[:, t, :],
                                 preferred_element_type=g.dtype,
                                 precision=jax.lax.Precision.HIGHEST))
        return jnp.concatenate(parts)

    bench(onehot_agg, ids2, g, steps=args.steps,
          label="onehot agg (17 small)")

    # the apply core with precomputed candidates (worst case: all valid)
    K = len(big) * B + sum(v for v in sizes if v <= 1024)
    cand_ids = jnp.asarray(np.random.randint(1, N, size=K), jnp.int32)
    cand_g = jax.random.normal(key, (K, D), jnp.float32)

    def apply_core(table, mu, nu, ids, agg):
        valid = (ids > 0) & jnp.any(jnp.abs(agg) > 0, axis=-1)
        read = jnp.where(valid, ids, 0)
        mu_r = mu.at[read].get(mode="promise_in_bounds")
        nu_r = nu.at[read].get(mode="promise_in_bounds")
        mu2 = mu_r + 0.1 * (agg - mu_r)
        nu2 = nu_r + 0.001 * (agg * agg - nu_r)
        step = -0.001 * mu2 / (jnp.sqrt(nu2) + 1e-8)
        w = jnp.where(valid, ids, N)
        table = table.at[w].add(step, mode="drop")
        mu = mu.at[w].set(mu2, mode="drop")
        nu = nu.at[w].set(nu2, mode="drop")
        return table, mu, nu

    bench(apply_core, table, mu, nu, cand_ids, cand_g,
          steps=args.steps, label=f"apply core (K={K})")

    # scatter-only: isolate the 3 scatters
    def scatters_only(table, mu, nu, ids, agg):
        w = ids
        table = table.at[w].add(agg, mode="drop")
        mu = mu.at[w].set(agg, mode="drop")
        nu = nu.at[w].set(agg, mode="drop")
        return table, mu, nu

    bench(scatters_only, table, mu, nu, cand_ids, cand_g,
          steps=args.steps, label="3 scatters only")

    def one_scatter(table, ids, agg):
        return table.at[ids].add(agg, mode="drop")

    bench(one_scatter, table, cand_ids, cand_g,
          steps=args.steps, label="1 scatter-add only")

    bench(lambda t, m, n, i, gg, c: optim.fused_table_lazy_adam(
        tuple(sizes), t, m, n, i, gg, c, 0.001),
        table, mu, nu, ids2, g, count,
        steps=args.steps, label="fused_table_lazy_adam")

    def dense_leaf(table, mu, nu, gdense):
        step, mu2, nu2 = optim.lazy_update_leaf(gdense, mu, nu, count, 0.001)
        return table + step, mu2, nu2

    gdense = jnp.zeros_like(table)
    bench(dense_leaf, table, mu, nu, gdense,
          steps=args.steps, label="dense lazy-adam full table")


if __name__ == "__main__":
    main()
