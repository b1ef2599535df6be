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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ml100k():
    from recstudio_tpu.data import TripletDataset
    np.random.seed(42)
    return TripletDataset("ml-100k")


@pytest.fixture(scope="session")
def ml100k_splits(ml100k):
    np.random.seed(42)
    return ml100k.build(split_ratio=[0.8, 0.1, 0.1])
