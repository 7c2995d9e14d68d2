"""Logging for byox_vllm_tpu.

Mirrors the reference's surface (nanovllm/utils/logging.py:5-33): a module-level
``logger``, ``init_logger`` and ``set_global_log_level`` helpers, with a
``file:line`` format so scheduler/block-manager DEBUG narration is traceable.
"""

import logging
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_ROOT_NAME = "byox_vllm_tpu"


def init_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def set_global_log_level(level: int | str) -> None:
    logging.getLogger(_ROOT_NAME).setLevel(level)


def _setup_root() -> logging.Logger:
    root = logging.getLogger(_ROOT_NAME)
    if not root.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(handler)
        root.setLevel(logging.WARNING)
        root.propagate = False
    return root


_setup_root()
logger = init_logger(_ROOT_NAME)
