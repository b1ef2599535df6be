"""Deterministic seeding across numpy / python / JAX.

Reference: recstudio/utils/utils.py:334-381 (seed_everything). JAX RNG is
functional, so beyond numpy/python seeding we hand back a root PRNGKey that the
training engine threads through every stochastic op.
"""
from __future__ import annotations

import os
import random

import numpy as np
import jax


def seed_everything(seed: int = 2022, workers: bool = False) -> int:
    random.seed(seed)
    np.random.seed(seed % (2**32))
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


_RNG_IMPLS = {"threefry": "threefry2x32", "rbg": "rbg", "unsafe_rbg": "unsafe_rbg"}


def root_key(seed: int, impl: str = "threefry") -> jax.Array:
    """Root PRNG key with a selectable implementation (train.rng_impl).

    `rbg` lowers to the TPU hardware generator and is faster than the
    default threefry for dropout/sampling-heavy jitted steps. Returns a
    typed key (jax.random.key) so split/fold_in inherit the implementation;
    raw `PRNGKey` arrays would silently rewrap with the process default.
    """
    return jax.random.key(seed, impl=_RNG_IMPLS.get(impl, impl))
