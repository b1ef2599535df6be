"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding tests run on XLA's host-platform device simulation —
the capability the reference never had (its DDP path is dead code,
reference recommender.py:740).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite's wall clock is dominated by
# fresh compiles (each integration test jits its own model). Warm runs of
# the fast tier drop from ~5 min to well under the 3-min budget.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_matmul_precision():
    """set_matmul_precision mutates process-global state (sticky across
    tests -> ordering-dependent failures, the round-4 regression). Snapshot
    and restore it around every test; restoring an unchanged value does not
    invalidate jit caches."""
    before = jax.config.jax_default_matmul_precision
    yield
    if jax.config.jax_default_matmul_precision != before:
        jax.config.update("jax_default_matmul_precision", before)


@pytest.fixture(scope="session")
def ml100k():
    from recstudio_tpu.data import TripletDataset
    np.random.seed(42)
    return TripletDataset("ml-100k")


@pytest.fixture(scope="session")
def ml100k_splits(ml100k):
    np.random.seed(42)
    return ml100k.build(split_ratio=[0.8, 0.1, 0.1])
