"""Library logging: transformers-style per-library logger with env-var
verbosity control and tqdm gating.

Reference parity: muse/logging.py:36-338 (``MUSE_VERBOSITY`` env var, named
verbosity levels, set_verbosity*, enable/disable_progress_bar).  Env var here:
``OPEN_MUSE_TPU_VERBOSITY`` (the reference reads ``muse_VERBOSITY``).
Rank-aware helpers gate non-primary hosts to warnings
(train_muse.py:284-287 equivalent via jax.process_index).
"""

from __future__ import annotations

import logging
import os
import sys
import threading
from typing import Optional

__all__ = [
    "get_logger",
    "get_verbosity",
    "set_verbosity",
    "set_verbosity_debug",
    "set_verbosity_info",
    "set_verbosity_warning",
    "set_verbosity_error",
    "enable_progress_bar",
    "disable_progress_bar",
    "is_progress_bar_enabled",
    "set_verbosity_for_process",
]

_lock = threading.Lock()
_default_handler: Optional[logging.Handler] = None
_progress_bar_enabled = True

log_levels = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
}
_default_log_level = logging.WARNING


def _get_default_logging_level():
    env_level = os.getenv("OPEN_MUSE_TPU_VERBOSITY", os.getenv("muse_VERBOSITY"))
    if env_level:
        if env_level.lower() in log_levels:
            return log_levels[env_level.lower()]
        logging.getLogger().warning(
            f"Unknown OPEN_MUSE_TPU_VERBOSITY={env_level}, "
            f"has to be one of: {', '.join(log_levels)}")
    return _default_log_level


def _get_library_name() -> str:
    return __name__.split(".")[0]


def _get_library_root_logger() -> logging.Logger:
    return logging.getLogger(_get_library_name())


def _configure_library_root_logger():
    global _default_handler
    with _lock:
        if _default_handler:
            return
        _default_handler = logging.StreamHandler(sys.stderr)
        _default_handler.flush = sys.stderr.flush
        root = _get_library_root_logger()
        root.addHandler(_default_handler)
        root.setLevel(_get_default_logging_level())
        root.propagate = False


def get_logger(name: Optional[str] = None) -> logging.Logger:
    """muse/logging.py:107-118."""
    if name is None:
        name = _get_library_name()
    _configure_library_root_logger()
    return logging.getLogger(name)


def get_verbosity() -> int:
    _configure_library_root_logger()
    return _get_library_root_logger().getEffectiveLevel()


def set_verbosity(verbosity: int):
    _configure_library_root_logger()
    _get_library_root_logger().setLevel(verbosity)


def set_verbosity_debug():
    set_verbosity(logging.DEBUG)


def set_verbosity_info():
    set_verbosity(logging.INFO)


def set_verbosity_warning():
    set_verbosity(logging.WARNING)


def set_verbosity_error():
    set_verbosity(logging.ERROR)


def set_verbosity_for_process(is_main_process: Optional[bool] = None):
    """INFO on the primary host, WARNING elsewhere (accelerate-style gating,
    train_muse.py:284-287)."""
    if is_main_process is None:
        try:
            import jax

            is_main_process = jax.process_index() == 0
        except Exception:
            is_main_process = True
    set_verbosity_info() if is_main_process else set_verbosity_error()


def enable_progress_bar():
    global _progress_bar_enabled
    _progress_bar_enabled = True


def disable_progress_bar():
    global _progress_bar_enabled
    _progress_bar_enabled = False


def is_progress_bar_enabled() -> bool:
    return _progress_bar_enabled
