from mmtpu.utils.logging import configure_logger, get_logger
from mmtpu.utils.printing import get_console
from mmtpu.utils.utils import (
    SafeDict,
    clean_checkpoints,
    flatten_dict,
    format_path_with_env,
    to_numpy,
)

__all__ = [
    "configure_logger",
    "get_logger",
    "get_console",
    "SafeDict",
    "clean_checkpoints",
    "flatten_dict",
    "format_path_with_env",
    "to_numpy",
]
