"""Singleton file/console logger (reference: experiment_utils/logging.py)."""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

_LOGGER_NAME = "mmtpu"
_configured = False


def configure_logger(
    log_path: Optional[str] = None,
    level: int = logging.INFO,
    suffix: Optional[str] = None,
) -> logging.Logger:
    """(Re)configure the global logger; file handler is optional."""
    global _configured
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level)
    logger.handlers.clear()
    fmt = logging.Formatter(
        "%(asctime)s | %(levelname)s | %(name)s | %(message)s"
    )
    if log_path is not None:
        path = Path(log_path)
        path.mkdir(parents=True, exist_ok=True)
        fname = f"{suffix}.log" if suffix else "mmtpu.log"
        fh = logging.FileHandler(path / fname)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    _configured = True
    return logger


def get_logger() -> logging.Logger:
    if not _configured:
        configure_logger()
    return logging.getLogger(_LOGGER_NAME)
