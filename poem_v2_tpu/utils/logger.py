"""Process-0-gated logging.

Equivalent of the reference's singleton ``ExpLogger`` with
``@master_only`` methods (lib/utils/logger.py, lib/utils/dist_utils.py).
In SPMD JAX there is one Python process per host; we gate on
``jax.process_index() == 0``.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGER: Optional[logging.Logger] = None

_FMT = "%(asctime)s | %(levelname)-7s | %(name)s | %(message)s"


def _is_master() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def get_logger(name: str = "poem_tpu", log_file: Optional[str] = None) -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None and log_file is None:
        return _LOGGER
    lg = logging.getLogger(name)
    lg.setLevel(logging.INFO)
    lg.propagate = False
    if not lg.handlers:
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(logging.Formatter(_FMT))
        lg.addHandler(sh)
    if log_file is not None:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_FMT))
        lg.addHandler(fh)
    if not _is_master():
        lg.setLevel(logging.ERROR)
    _LOGGER = lg
    return lg


class _Proxy:
    """Lazy logger proxy so ``from ... import logger`` works before setup."""

    def __getattr__(self, item):
        return getattr(get_logger(), item)


logger = _Proxy()


def master_only(fn):
    """Decorator: run only on process 0 (reference lib/utils/dist_utils.py:16-24)."""

    def wrapper(*args, **kwargs):
        if _is_master():
            return fn(*args, **kwargs)
        return None

    return wrapper
