from .loader import (
    restore_string_to_list_in_a_dict,
    load_config,
    find_config_file,
    DEFAULT_POINTNET_CONFIG,
    tiny_pointnet_config,
)

__all__ = [
    "restore_string_to_list_in_a_dict",
    "load_config",
    "find_config_file",
    "DEFAULT_POINTNET_CONFIG",
    "tiny_pointnet_config",
]

from .exp_configs import EXPERIMENTS, ddpm_config, ddpm_avg_max_config, refine_config, write_all
__all__ += ["EXPERIMENTS", "ddpm_config", "ddpm_avg_max_config", "refine_config", "write_all"]
