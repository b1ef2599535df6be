"""Import reference (torch) RecStudio checkpoints into this framework.

The reference saves ``{'config', 'model', 'epoch', 'parameters':
state_dict, 'metric'}`` via torch.save (reference utils/callbacks.py:67-73,
consumed at reference basemodel/recommender.py:772-777). This module maps
that torch ``state_dict`` onto our flax param pytrees so a user can bring
trained weights across without retraining.

Key mapping (module names match the reference by design — both frameworks
name the towers ``item_encoder`` / ``query_encoder`` etc.):

- torch ``Embedding``:  ``a.b.weight``  -> ours ``a/b/embedding`` (copied)
- torch ``Linear``:     ``a.b.weight``  -> ours ``a/b/kernel`` (TRANSPOSED)
  and ``a.b.bias`` -> ``a/b/bias``
- torch ``LayerNorm``:  ``a.weight``/``a.bias`` -> ``a/scale``/``a/bias``

Row order caveat: embedding row r holds the entity whose factorized id is
r. Both ETLs factorize tokens in first-occurrence order with ``[PAD]`` at
row 0, so rows align when the dataset + filtering config match; pass
``row_perms={'item_encoder': perm}`` to permute otherwise (``perm[i]`` =
reference row holding our id ``i``).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_reference_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference torch .ckpt -> payload with numpy 'parameters'."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("parameters", payload)
    if hasattr(sd, "items"):
        payload["parameters"] = {
            k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in sd.items()}
    return payload


# our fused TransformerLayer leaves -> torch nn.TransformerEncoderLayer
# tensors (torch fuses q/k/v exactly like our qkv_kernel: in_proj_weight)
_TRANSFORMER_LEAVES = {
    "qkv_kernel": ("self_attn.in_proj_weight", True),
    "qkv_bias": ("self_attn.in_proj_bias", False),
    "out_kernel": ("self_attn.out_proj.weight", True),
    "out_bias": ("self_attn.out_proj.bias", False),
    "norm1_scale": ("norm1.weight", False),
    "norm1_bias": ("norm1.bias", False),
    "ffn1_kernel": ("linear1.weight", True),
    "ffn1_bias": ("linear1.bias", False),
    "ffn2_kernel": ("linear2.weight", True),
    "ffn2_bias": ("linear2.bias", False),
    "norm2_scale": ("norm2.weight", False),
    "norm2_bias": ("norm2.bias", False),
}


def _prefix_variants(prefix: List[str]) -> List[str]:
    """Dotted torch prefixes that could correspond to our module path.

    Handles the transformer container renames: our ``transformer/layer_N``
    vs torch ``transformer_layer.layers.N`` (reference seq/sasrec.py wraps
    torch nn.TransformerEncoder as ``transformer_layer``).
    """
    variants = [prefix]
    mapped = []
    for comp in prefix:
        if comp == "transformer":
            mapped.extend(["transformer_layer", "layers"])
        elif comp.startswith("layer_") and comp[6:].isdigit():
            mapped.append(comp[6:])
        else:
            mapped.append(comp)
    if mapped != prefix:
        variants.append(mapped)
        # some reference encoders name the container just "transformer"
        alt = [c for c in mapped]
        if alt and alt[0:1] != ["transformer_layer"]:
            pass
        variants.append(["transformer" if c == "transformer_layer" else c
                         for c in mapped])
    return [".".join(v) for v in variants]


def _candidates(path: Tuple[str, ...]) -> List[Tuple[str, bool]]:
    """Torch state_dict keys that could hold this flax leaf.

    Returns ``[(torch_key, transpose), ...]`` in preference order.
    """
    *prefix, leaf = path
    out: List[Tuple[str, bool]] = []
    for base in _prefix_variants(list(prefix)):
        dot = (base + ".") if base else ""
        if leaf == "embedding":
            out += [(dot + "weight", False), (base, False)]
        elif leaf == "kernel":
            out += [(dot + "weight", True)]
        elif leaf == "scale":   # flax LayerNorm/BatchNorm scale <- torch weight
            out += [(dot + "weight", False)]
        elif leaf == "bias":
            out += [(dot + "bias", False)]
        elif leaf in _TRANSFORMER_LEAVES:
            torch_leaf, transpose = _TRANSFORMER_LEAVES[leaf]
            out += [(dot + torch_leaf, transpose)]
        else:
            out += [(dot + leaf, False),
                    (base + "." + leaf if base else leaf, False)]
    return out


def import_state_dict(params, state_dict: Dict[str, np.ndarray],
                      row_perms: Optional[Dict[str, np.ndarray]] = None,
                      strict: bool = False):
    """Map a torch ``state_dict`` onto a flax param pytree.

    Returns ``(new_params, report)`` where report lists matched / skipped
    leaves and unused torch keys. ``strict=True`` raises if any leaf of
    ``params`` found no matching torch tensor.
    """
    import jax

    row_perms = row_perms or {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    used, matched, skipped = set(), [], []
    updates = {}
    for keypath, leaf in flat:
        names = tuple(str(getattr(k, "key", getattr(k, "idx", None)))
                      for k in keypath)
        ok = False
        for torch_key, transpose in _candidates(names):
            if torch_key not in state_dict:
                continue
            w = state_dict[torch_key]
            w = w.T if transpose else w
            if tuple(w.shape) != tuple(leaf.shape):
                continue
            for scope, perm in row_perms.items():
                if scope in names:
                    w = np.asarray(w)[np.asarray(perm)]
            updates[names] = np.asarray(w, dtype=np.asarray(leaf).dtype)
            used.add(torch_key)
            matched.append("/".join(map(str, names)))
            ok = True
            break
        if not ok:
            skipped.append("/".join(map(str, names)))

    if strict and skipped:
        raise ValueError(f"no torch tensor matched params leaves: {skipped}")

    def rebuild(keypath, leaf):
        names = tuple(str(getattr(k, "key", getattr(k, "idx", None)))
                      for k in keypath)
        return updates.get(names, leaf)

    new_params = jax.tree_util.tree_map_with_path(rebuild, params)
    report = {"matched": matched, "skipped": skipped,
              "unused_torch_keys": sorted(set(state_dict) - used)}
    return new_params, report


def import_reference_checkpoint(model, path: str,
                                row_perms: Optional[Dict[str, np.ndarray]] = None,
                                strict: bool = False) -> Dict[str, Any]:
    """Load a reference .ckpt into a built model (in place). Returns the
    match report. The model must already be initialized against a dataset
    (``fit`` with 0 epochs, or ``serving.load_for_serving``'s init path)."""
    payload = load_reference_checkpoint(path)
    new_params, report = import_state_dict(
        model.params, payload["parameters"], row_perms=row_perms,
        strict=strict)
    model.params = new_params
    # refresh derived state (item vectors / ann index) from imported params
    if hasattr(model, "_epoch_refresh"):
        model.states.pop("item_vector", None)
        model._epoch_refresh(-1)
    return report
