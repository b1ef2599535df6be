"""quickstart.run: one-call train + evaluate.

Mirrors the reference entry (recstudio/quickstart/run.py:11-61): resolve the
model class + layered config, build the dataset, fit with validation, then
evaluate on the test split.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Union

from ..utils import (deep_update, get_logger, get_model, load_yaml,
                     seed_everything)


def run(model: str, dataset: str, model_config: Optional[Union[Dict, str]] = None,
        data_config: Optional[Union[Dict, str]] = None,
        model_config_path: Optional[str] = None,
        data_config_path: Optional[str] = None,
        verbose: bool = True, run_mode: str = "light", **kwargs):
    model_class, model_conf = get_model(model)

    if model_config_path is not None:
        model_conf = deep_update(model_conf, load_yaml(model_config_path))
    if isinstance(model_config, dict):
        model_conf = deep_update(model_conf, model_config)
    elif isinstance(model_config, str):
        model_conf = deep_update(model_conf, load_yaml(model_config))
    if kwargs:
        grouped = {k: v for k, v in kwargs.items()
                   if isinstance(v, dict) and k in ("data", "model", "train", "eval")}
        model_conf = deep_update(model_conf, grouped)

    if run_mode == "tune":
        from ..utils.misc import update_config_with_nni
        model_conf = update_config_with_nni(model_conf)

    log_dir = os.path.join("log", f"{model_class.__name__}", dataset)
    logger = get_logger(log_dir=log_dir if verbose else None)
    seed_everything(model_conf["train"].get("seed") or 2022)

    rec = model_class(model_conf)

    data_conf: Dict[str, Any] = {}
    if data_config_path is not None:
        data_conf = load_yaml(data_config_path)
    if isinstance(data_config, dict):
        data_conf = deep_update(data_conf, data_config)
    elif isinstance(data_config, str):
        data_conf = deep_update(data_conf, load_yaml(data_config))

    # ETL-level keys in the model's data group override the dataset config
    # (reference quickstart/run.py:45-59)
    _ETL_KEYS = ("low_rating_thres", "min_user_inter", "min_item_inter",
                 "max_seq_len", "drop_dup", "field_max_len",
                 "float_field_preprocess", "save_cache")
    etl_overrides = {k: v for k, v in model_conf.get("data", {}).items()
                     if k in _ETL_KEYS}
    data_conf = deep_update(etl_overrides, data_conf)

    dataset_class = model_class._get_dataset_class()
    ds = dataset_class(name=dataset, config=data_conf or None)
    datasets = ds.build(**model_conf["data"])
    logger.info(f"dataset {dataset}: {ds.num_users - 1} users, {ds.num_items - 1} items, "
                f"{ds.num_inters} interactions")

    val = datasets[1] if len(datasets) > 1 else None
    rec.fit(datasets[0], val, run_mode=run_mode)
    test_result = rec.evaluate(datasets[-1]) if len(datasets) > 2 else None
    if run_mode == "tune":
        try:
            import nni
            if test_result:
                nni.report_final_result(
                    {"default": next(iter(test_result.values())), **test_result})
        except ImportError:
            pass
    return rec, datasets, test_result
