"""IVF vs exact MIPS at catalog scale on the real chip.

Builds a clustered 1M x 64 catalog (the regime trained embedding tables live
in), then measures exact full-catalog top-20 vs `train.ann: ivf` — recall and
speedup. Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(N=1_000_000, D=64, B=512, k=20, K=1024, nprobe=64):
    import jax
    import jax.numpy as jnp
    from recstudio_tpu.ann.ivf import build_ivf, ivf_search
    from recstudio_tpu.ops.topk import chunked_topk

    rng = jax.random.PRNGKey(0)
    nc = 2000  # latent clusters
    centers = 3.0 * jax.random.normal(rng, (nc, D))
    assign = jax.random.randint(jax.random.fold_in(rng, 1), (N,), 0, nc)
    items = centers[assign] + 0.5 * jax.random.normal(jax.random.fold_in(rng, 2), (N, D))
    queries = centers[jax.random.randint(jax.random.fold_in(rng, 3), (B,), 0, nc)] \
        + 0.5 * jax.random.normal(jax.random.fold_in(rng, 4), (B, D))
    items = items.block_until_ready()

    exact = jax.jit(lambda q, it: chunked_topk(q @ it.T, k))
    ev, eids = exact(queries, items)
    ev.block_until_ready()
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        ev, eids = exact(queries, items)
    float(ev[0, 0]); t_exact = (time.time() - t0) / reps

    t0 = time.time()
    index = build_ivf(jax.random.fold_in(rng, 5), items, num_clusters=K)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), index)
    t_build = time.time() - t0

    av, aids = ivf_search(index, items, queries, k, nprobe)
    av.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        av, aids = ivf_search(index, items, queries, k, nprobe)
    float(av[0, 0]); t_ivf = (time.time() - t0) / reps

    e = np.asarray(eids)
    a = np.asarray(aids) - 1
    recall = np.mean([len(set(a[b]) & set(e[b])) / k for b in range(B)])

    print(json.dumps({
        "metric": f"IVF recall@{k} vs exact ({N // 10**6}M x {D} catalog)",
        "value": round(float(recall), 4),
        "unit": "recall",
        "exact_ms": round(t_exact * 1e3, 2),
        "ivf_ms": round(t_ivf * 1e3, 2),
        "speedup": round(t_exact / t_ivf, 2),
        "build_s": round(t_build, 2),
        "B": B, "K": K, "nprobe": nprobe,
    }), flush=True)


if __name__ == "__main__":
    main()
