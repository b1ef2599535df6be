"""Misc utilities mirroring the reference's utils grab-bag.

- ``update_config_with_nni``: pull hyperparameters from an NNI trial into the
  nested config (reference utils/utils.py:197-223 — keys use the ``group/key``
  convention, e.g. ``train/learning_rate``).
- ``mask_with_hist``: scatter -inf into a score matrix at user-history item
  ids (reference utils/utils.py:474-500).
- ``dict2markdown_table``: render a (nested) config dict as a markdown table
  for TensorBoard text panels (reference utils/utils.py:502-514).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# train.precision -> jax_default_matmul_precision, resolved PER BACKEND.
#
# The framework default is ``default`` (Precision.DEFAULT): on TPU that is
# the one-pass bf16 MXU datapath with f32 accumulation, on CPU exact f32.
# Round 3's claim that the unset default was pathologically slow (a 2048^2
# dot at ~2.2 s) did NOT reproduce under a pinned round-robin probe
# (scripts/precision_probe.py, 2026-08-20, real chip): unset/default/
# bfloat16 all measure ~84 TFLOP/s at 4096^2 while BF16_BF16_F32_X3 is ~2x
# slower (45) and "highest" ~3x slower (26); the one-off 2.2 s reading was
# a transient tunnel stall. Rounds 1-3 trained the whole zoo at DEFAULT
# with healthy metrics, so DEFAULT is both the fast and the proven-safe
# choice (VERDICT r4 task 6).
#
# ``bf16_3x`` (3-pass compensated bf16, ~21 mantissa bits, numerically
# f32-equivalent) stays available as an opt-in, but its DotAlgorithmPreset
# is TPU-only — XLA:CPU's ElementalIrEmitter hard-errors on it (the round-4
# regression), so off-TPU it resolves to "highest" (the numerics it
# emulates). Pallas kernels never see the process-global value either way:
# Mosaic cannot lower a DotAlgorithmPreset, so every in-kernel dot passes
# an explicit ``precision=`` (ops/transformer_layer.py::_dot,
# ops/attention.py, ops/softmax_z.py).
_PRECISION_MAP = {
    "default": "default",
    "bf16_3x": "BF16_BF16_F32_X3",
    "bf16": "bfloat16",
    "bfloat16": "bfloat16",
    "fp32": "highest",
    "float32": "highest",
    "highest": "highest",
}

# DotAlgorithmPreset values only XLA:TPU implements; resolved to the
# numerically-equivalent Precision enum elsewhere (CPU/GPU/interpret).
_TPU_ONLY = {"BF16_BF16_F32_X3": "highest"}


def resolve_matmul_precision(precision: Optional[str]) -> str:
    """Map a ``train.precision`` string to the jax_default_matmul_precision
    value for the CURRENT backend (backend-aware: TPU-only dot-algorithm
    presets fall back to their numerically-equivalent Precision enum on
    other backends)."""
    import jax
    key = str(precision or "default").lower()
    try:
        value = _PRECISION_MAP[key]
    except KeyError:
        raise ValueError(
            f"train.precision={precision!r}: expected one of "
            f"{sorted(set(_PRECISION_MAP))}") from None
    if value in _TPU_ONLY and jax.default_backend() != "tpu":
        value = _TPU_ONLY[value]
    return value


def set_matmul_precision(precision: Optional[str]) -> None:
    """Set the process-wide matmul precision from a ``train.precision``
    string (``default`` | ``bf16_3x`` | ``bf16`` | ``fp32``; None -> ``default``)."""
    import jax
    jax.config.update("jax_default_matmul_precision",
                      resolve_matmul_precision(precision))


def update_config_with_nni(config: Dict) -> Dict:
    """Overlay NNI-tuned parameters onto the layered config (tune mode)."""
    try:
        import nni
    except ImportError:
        return config
    params = nni.get_next_parameter() or {}
    for key, value in params.items():
        if "/" in key:
            group, name = key.split("/", 1)
            if group in config and isinstance(config[group], dict):
                config[group][name] = value
                continue
        for group in ("train", "model", "eval", "data"):
            if isinstance(config.get(group), dict) and key in config[group]:
                config[group][key] = value
                break
    return config


def mask_with_hist(scores: np.ndarray, user_hist: np.ndarray,
                   fill: float = -np.inf) -> np.ndarray:
    """Set ``scores[b, hist-1]`` to ``fill`` for every non-pad history id.

    ``scores`` columns correspond to item ids 1..N (column j = item j+1), the
    layout of full-catalog score matrices; pad ids (0) are ignored. Works for
    numpy and jax arrays (functional update for jax).
    """
    n_cols = scores.shape[-1]
    col = np.where(np.asarray(user_hist) > 0, np.asarray(user_hist) - 1, n_cols)
    rows = np.arange(scores.shape[0])[:, None]
    if isinstance(scores, np.ndarray):
        out = scores.copy()
        valid = col < n_cols
        out[np.broadcast_to(rows, col.shape)[valid], col[valid]] = fill
        return out
    return scores.at[rows, col].set(fill, mode="drop")


def dict2markdown_table(d: Dict, nested: bool = False) -> str:
    rows = []
    if nested:
        for group, sub in d.items():
            if isinstance(sub, dict):
                for k, v in sub.items():
                    rows.append((f"{group}/{k}", v))
            else:
                rows.append((group, sub))
    else:
        rows = list(d.items())
    lines = ["| key | value |", "| --- | --- |"]
    lines += [f"| {k} | {v} |" for k, v in rows]
    return "\n".join(lines)
