"""Logging — the real implementation of the module the reference checkout is
missing (11 files import FullSubNet_plus/speech_enhance/utils/logger.py which
does not exist; SURVEY.md header). Console + optional file logger, a `log`
function with the same call shape as the reference's `print = log` usage,
plus the ExecutionTime timer (audio_zen/utils.py:46-60) and check_nan
(audio_zen/utils.py:41-44).
"""
from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Optional

__all__ = ["get_logger", "log", "init_logging_file", "ExecutionTime",
           "check_nan"]

_LOGGER: Optional[logging.Logger] = None


def get_logger(name: str = "generative_audio_tpu") -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger(name)
        logger.setLevel(logging.INFO)
        if not logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(logging.Formatter(
                "%(asctime)s [%(levelname)s] %(message)s", "%H:%M:%S"))
            logger.addHandler(handler)
        logger.propagate = False
        _LOGGER = logger
    return _LOGGER


def init_logging_file(path, name: str = "generative_audio_tpu"):
    """Attach a file handler (the reference's intended utils/logger.log)."""
    logger = get_logger(name)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    handler = logging.FileHandler(path)
    handler.setFormatter(logging.Formatter(
        "%(asctime)s [%(levelname)s] %(message)s"))
    logger.addHandler(handler)
    return logger


def log(*args, **kwargs):
    """Drop-in for the reference's `print = log` idiom."""
    get_logger().info(" ".join(str(a) for a in args))


class ExecutionTime:
    """with/duration timer. Ref audio_zen/utils.py:46-60."""

    def __init__(self):
        self.start_time = time.time()

    def duration(self) -> float:
        return time.time() - self.start_time


def check_nan(tensor, name: str = "tensor"):
    """Ref audio_zen/utils.py:41-44."""
    import numpy as np
    arr = np.asarray(tensor)
    if np.isnan(arr).any():
        raise ValueError(f"Found NaN in {name}")
    return tensor
