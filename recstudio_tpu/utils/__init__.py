from .config import (CONFIG_GROUPS, color_dict_normal, deep_update,
                     get_base_model_config, load_yaml, parser_yaml)
from .logger import get_logger
from .registry import get_dataset_default_config, get_model, list_models
from .misc import (dict2markdown_table, mask_with_hist, set_matmul_precision,
                   update_config_with_nni)
from .seed import root_key, seed_everything
from .arguments import (add_model_arguments, get_default_parser,
                        parser2nested_dict)

__all__ = [
    "CONFIG_GROUPS", "color_dict_normal", "deep_update", "get_base_model_config",
    "load_yaml", "parser_yaml", "get_logger", "get_dataset_default_config",
    "get_model", "list_models", "root_key", "seed_everything",
    "add_model_arguments", "get_default_parser", "parser2nested_dict",
]
