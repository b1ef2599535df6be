"""Native (C++) host-runtime kernels with lazy compilation and fallback.

The TPU compute path is JAX/XLA/Pallas; these kernels accelerate the
host-side ETL (the part the reference delegates to scipy/pandas). The shared
library is built on first use with the local toolchain; every caller has a
pure-numpy fallback so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_libkcore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "kcore.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None:
            return _lib
        if _tried:
            return None
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.kcore_filter.restype = ctypes.c_int64
            lib.kcore_filter.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8)]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def kcore_filter(users: np.ndarray, items: np.ndarray, n_users: int, n_items: int,
                 min_user: int, min_item: int) -> np.ndarray:
    """Boolean keep-mask per interaction after alternating k-core pruning."""
    users = np.ascontiguousarray(users, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    lib = get_lib()
    if lib is not None:
        keep = np.zeros(len(users), dtype=np.uint8)
        lib.kcore_filter(
            users.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(users), n_users, n_items, min_user, min_item,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return keep.astype(bool)
    # numpy fallback: alternating degree pruning
    ualive = np.ones(n_users, dtype=bool)
    ialive = np.ones(n_items, dtype=bool)
    while True:
        alive = ualive[users] & ialive[items]
        udeg = np.bincount(users[alive], minlength=n_users)
        ideg = np.bincount(items[alive], minlength=n_items)
        new_u = ualive & ((udeg >= min_user) | (min_user <= 0))
        new_i = ialive & ((ideg >= min_item) | (min_item <= 0))
        if new_u.sum() == ualive.sum() and new_i.sum() == ialive.sum():
            break
        ualive, ialive = new_u, new_i
    return ualive[users] & ialive[items]
