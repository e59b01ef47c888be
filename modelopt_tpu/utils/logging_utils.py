"""Logging helpers (reference: modelopt/torch/utils/logging.py:109
print_rank_0 / warn_rank_0 — rank = jax.process_index here)."""

from __future__ import annotations

import logging
import warnings

logger = logging.getLogger("modelopt_tpu")


def _is_rank0() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def print_rank_0(*args, **kwargs):
    if _is_rank0():
        print(*args, **kwargs)


def warn_rank_0(msg: str):
    if _is_rank0():
        warnings.warn(msg, stacklevel=2)


def log_rank_0(level: int, msg: str):
    if _is_rank0():
        logger.log(level, msg)
