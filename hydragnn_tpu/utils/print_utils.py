"""Verbosity-policed printing/logging (ref: hydragnn/utils/print/print_utils.py:20-111)."""

from __future__ import annotations

import logging
import os
from typing import Iterable, Optional

import jax

_logger: Optional[logging.Logger] = None


def _rank() -> int:
    try:
        return jax.process_index()
    except Exception:
        return 0


def print_distributed(verbosity: int, *args, verbosity_level: int = 1) -> None:
    if verbosity >= verbosity_level and _rank() == 0:
        print(*args, flush=True)


def print_master(*args) -> None:
    if _rank() == 0:
        print(*args, flush=True)


def iterate_tqdm(iterator: Iterable, verbosity: int, **kwargs):
    if verbosity >= 2 and _rank() == 0:
        try:
            from tqdm import tqdm

            return tqdm(iterator, **kwargs)
        except ImportError:
            pass
    return iterator


def setup_log(log_name: str, path: str = "./logs/") -> logging.Logger:
    """Per-run log file logs/<name>/run.log (ref: print_utils.py:63-91)."""
    global _logger
    d = os.path.join(path, log_name)
    os.makedirs(d, exist_ok=True)
    logger = logging.getLogger("hydragnn_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(d, "run.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(fh)
    if _rank() == 0:
        logger.addHandler(logging.StreamHandler())
    _logger = logger
    return logger


def log(*args) -> None:
    if _logger is not None:
        _logger.info(" ".join(str(a) for a in args))
    else:
        print_master(*args)


def log0(*args) -> None:
    if _rank() == 0:
        log(*args)
