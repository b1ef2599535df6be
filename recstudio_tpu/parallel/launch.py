"""Multi-host launch utilities.

The reference's only multi-process story is the dead NCCL/DDP spawn path
(reference recstudio/model/basemodel/recommender.py:145-174 — unreachable:
``_accelerate`` raises before the spawn) plus ``DistributedSamplerWrapper``
(data/dataset.py:1868-1914). The TPU-native replacement:

- ``initialize()`` wraps ``jax.distributed.initialize``: on a multi-host TPU
  slice each host runs the SAME program; the TPU runtime discovers peers from
  the pod metadata (no coordinator flags needed on Cloud TPU), or a
  coordinator address can be given explicitly for CPU/GPU clusters.
- ``local_shard()`` replaces DistributedSamplerWrapper: each host keeps only
  its contiguous slice of the epoch's example index space (per-host input
  sharding — each host reads 1/num_hosts of the data, then
  ``jax.make_array_from_process_local_data`` assembles the global batch).
- ``global_batch()`` builds a globally-sharded jax.Array from per-host numpy
  batches, sharded over the mesh's ``dp`` axis.

Single-host use is a no-op throughout (process_count == 1), so the same
training script runs unchanged from a laptop CPU to a multi-host slice:

    from recstudio_tpu.parallel import launch
    launch.initialize()          # no-op on one host
    ...normal quickstart.run(...)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent, single-host no-op).

    On Cloud TPU pods, call with no arguments — the runtime autodetects the
    slice topology. Elsewhere pass coordinator_address="host:port",
    num_processes, process_id explicitly.
    """
    if coordinator_address is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            pass  # single process / already initialized
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_shard(n_examples: int, drop_remainder: bool = True) -> slice:
    """This host's contiguous slice of [0, n_examples) — the per-host input
    shard that replaces the reference's DistributedSamplerWrapper."""
    p, i = jax.process_count(), jax.process_index()
    if p == 1:
        return slice(0, n_examples)
    per = n_examples // p if drop_remainder else -(-n_examples // p)
    start = i * per
    return slice(start, min(start + per, n_examples))


def global_batch(local: Dict[str, np.ndarray], mesh) -> Dict[str, jax.Array]:
    """Assemble a globally dp-sharded batch from each host's local arrays.

    ``local[k]`` holds this host's rows; the returned jax.Arrays are global
    views sharded over the mesh's 'dp' axis (XLA addresses only the local
    shard on each host — no cross-host data movement).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = {}
    for k, v in local.items():
        spec = P("dp", *([None] * (v.ndim - 1))) if v.ndim >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
