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


def root_key(seed: int) -> jax.Array:
    return jax.random.PRNGKey(seed)
