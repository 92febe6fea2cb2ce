from transformer4sed_tpu.utils.config import load_yaml_with_include, save_config, get_save_directories
from transformer4sed_tpu.utils.logging import Logger, BestModels
from transformer4sed_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

__all__ = [
    "load_yaml_with_include",
    "save_config",
    "get_save_directories",
    "Logger",
    "BestModels",
    "save_checkpoint",
    "restore_checkpoint",
]
