"""Model registry: name -> (model class, layered default config).

Mirrors the reference lookup contract (recstudio/utils/utils.py:123-154):
model names are case-insensitive module file names under the family packages;
the class name inside the module must match exactly. The returned config is
the deep merge of basemodel defaults -> family ``all.yaml`` -> ``<model>.yaml``.
"""
from __future__ import annotations

import importlib
import os
import pkgutil
from typing import Any, Dict, Tuple, Type

from .config import deep_update, get_base_model_config, load_yaml, PKG_ROOT

MODEL_FAMILIES = ("mf", "seq", "ae", "fm", "graph", "kg", "multitask", "debias")

# helper modules living inside family packages that are not models
_NON_MODEL_MODULES = {"base", "kglearning", "recommender_helpers"}


def _family_dir(family: str) -> str:
    return os.path.join(PKG_ROOT, "models", family)


def list_models() -> Dict[str, str]:
    """Return {model_name_lower: family}."""
    out = {}
    for family in MODEL_FAMILIES:
        d = _family_dir(family)
        if not os.path.isdir(d):
            continue
        for m in pkgutil.iter_modules([d]):
            if not m.ispkg and m.name.lower() not in _NON_MODEL_MODULES:
                out[m.name.lower()] = family
    return out


def get_model(model_name: str) -> Tuple[Type, Dict[str, Any]]:
    """Look up a model class by name and assemble its layered default config."""
    lname = model_name.lower()
    families = list_models()
    if lname not in families:
        raise ValueError(
            f"Model '{model_name}' not found. Available: {sorted(families)}")
    family = families[lname]
    module = importlib.import_module(f"recstudio_tpu.models.{family}.{lname}")
    # exact class-name match, searched case-insensitively over module symbols
    model_class = None
    for attr in dir(module):
        if attr.lower() == lname:
            model_class = getattr(module, attr)
            break
    if model_class is None:
        raise ValueError(f"Module for '{model_name}' does not define a matching class.")

    conf = get_base_model_config()
    fam_all = os.path.join(_family_dir(family), "config", "all.yaml")
    if os.path.isfile(fam_all):
        conf = deep_update(conf, load_yaml(fam_all))
    model_yaml = os.path.join(_family_dir(family), "config", f"{lname}.yaml")
    if os.path.isfile(model_yaml):
        conf = deep_update(conf, load_yaml(model_yaml))
    return model_class, conf


def get_dataset_default_config(dataset_name: str) -> Dict[str, Any]:
    """data/config/all.yaml overlaid by data/config/<dataset>.yaml."""
    data_dir = os.path.join(PKG_ROOT, "data", "config")
    conf = load_yaml(os.path.join(data_dir, "all.yaml"))
    ds_yaml = os.path.join(data_dir, f"{dataset_name}.yaml")
    if os.path.isfile(ds_yaml):
        conf = deep_update(conf, load_yaml(ds_yaml))
    return conf
