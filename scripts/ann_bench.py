"""ANN options vs exact MIPS at catalog scale on the real chip.

Builds a clustered 4M x 64 catalog (the regime trained embedding tables live
in) and measures, at online-serving batch size (B=8, one user request per
row): exact dense top-20 (`chunked_topk`), the TPU-hardware approximate path
(`train.ann: approx` -> jax.lax.approx_max_k), and the IVF inverted-list
index (`train.ann: ivf`). Prints one JSON line with recall + latency each.

Timing protocol (this transport lies): DISTINCT query batches per call (the
runtime caches identical (executable, args) executions), warmup call
completed with a HOST READ (block_until_ready can return before device
completion — first executions of a large executable can take tens of
seconds and would otherwise leak into the timed window), then a timed loop
fenced by a host read that depends on every output.

Regime notes (read-fenced steady state, v5e):
- batch eval (B>=256): the dense [B, N] matmul + top_k amortizes the
  catalog read across the batch on the MXU; exact is already fast and
  `approx` beats it ~7x — IVF's per-query gathers lose. Exact stays the
  default; `approx` is the recommended speedup.
- tiny-batch serving on huge catalogs: IVF reads only the probed lists
  (B*nprobe*cap*D bytes vs the full N*D), the only regime where an
  inverted index pays on this hardware.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_fence(outs):
    import jax.numpy as jnp
    float(jnp.stack([o[0] for o in outs]).sum())


def main(N=4_000_000, D=64, B=8, k=20, K=2048, nprobe=24):
    import jax
    import jax.numpy as jnp
    from recstudio_tpu.ann.ivf import build_ivf, ivf_search
    from recstudio_tpu.ops.topk import approx_topk, streaming_topk

    rng = jax.random.PRNGKey(0)
    nc = 2000  # latent clusters
    centers = 3.0 * jax.random.normal(rng, (nc, D))
    assign = jax.random.randint(jax.random.fold_in(rng, 1), (N,), 0, nc)
    items = centers[assign] + 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (N, D))
    queries = centers[jax.random.randint(jax.random.fold_in(rng, 3), (B,), 0, nc)] \
        + 0.5 * jax.random.normal(jax.random.fold_in(rng, 4), (B, D))
    items = items.block_until_ready()
    print("items ready", flush=True)

    reps = 20
    qbatches = [centers[jax.random.randint(jax.random.fold_in(rng, 100 + r),
                                           (B,), 0, nc)]
                + 0.5 * jax.random.normal(jax.random.fold_in(rng, 200 + r),
                                          (B, D)) for r in range(reps)]
    _read_fence([(q,) for q in qbatches])

    def timed(fn, *state):
        # state is passed as jit ARGUMENTS — a closure would bake the
        # catalog into the remote-compile payload (HTTP 413 on the tunnel)
        out = fn(queries, *state)  # compile + first-execution warmup
        _read_fence([out])         # host read: genuinely complete
        t0 = time.time()
        outs = [fn(q, *state) for q in qbatches]
        _read_fence(outs)
        return out, (time.time() - t0) / reps

    # streaming merge, not lax.top_k: the full-sort lowering's FIRST
    # execution at [8, 4M] runs minutes-to-wedged on the tunneled runtime
    # (steady state is comparable: 8.5 vs 9.4 ms read-fenced)
    exact = jax.jit(lambda q, it: streaming_topk(q @ it.T, k, 131072))
    (ev, eids), t_exact = timed(exact, items)
    print("exact done", flush=True)

    approx = jax.jit(lambda q, it: approx_topk(q @ it.T, k, 0.95))
    (av2, aids2), t_approx = timed(approx, items)
    print("approx done", flush=True)

    t0 = time.time()
    index = build_ivf(jax.random.fold_in(rng, 5), items, num_clusters=K,
                      cap_factor=1.25)
    jax.block_until_ready(index)
    t_build = time.time() - t0
    print("index built", round(t_build, 1), "s", flush=True)

    (av, aids), t_ivf = timed(
        lambda q, ix, it: ivf_search(ix, it, q, k, nprobe), index, items)

    e = np.asarray(eids)

    def recall(ids0):
        a = np.asarray(ids0)
        return float(np.mean([len(set(a[b]) & set(e[b])) / k
                              for b in range(B)]))

    print(json.dumps({
        "metric": f"ANN recall@{k} vs exact ({N // 10**6}M x {D} catalog)",
        "value": recall(np.asarray(aids) - 1),
        "unit": "recall (ivf)",
        "exact_ms": round(t_exact * 1e3, 2),
        "approx_ms": round(t_approx * 1e3, 2),
        "approx_recall": recall(np.asarray(aids2)),
        "ivf_ms": round(t_ivf * 1e3, 2),
        "ivf_build_s": round(t_build, 2),
        "B": B, "K": K, "nprobe": nprobe,
    }), flush=True)


if __name__ == "__main__":
    main()
