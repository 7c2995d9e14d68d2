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
        # stderr, not stdout: bench.py's driver contract is ONE JSON line on
        # stdout, and engine warnings (e.g. random-init notice) were leaking
        # into it (the reference logs to stdout; its bench has no contract)
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT))
        root.addHandler(handler)
        root.setLevel(logging.WARNING)
        root.propagate = False
    return root


_setup_root()
logger = init_logger(_ROOT_NAME)
