"""Loader for the native host-runtime extension (csrc/native.cc).

Builds the C++ extension on first use (cached under ~/.cache) and falls back
to pure-Python implementations if no toolchain is available — the extension
is an acceleration of the control plane, never a requirement.
"""

import os
import subprocess
import sys
import sysconfig
from functools import cache

from byox_vllm_tpu.utils.logging import logger

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc", "native.cc")
_BUILD_DIR = os.path.expanduser("~/.cache/byox_vllm_tpu_native")


@cache
def load_native():
    """The compiled module, or None (with one warning) if unavailable."""
    if os.environ.get("BYOX_NO_NATIVE"):
        return None
    try:
        return _load_or_build()
    except Exception as e:  # pragma: no cover - toolchain-dependent
        logger.warning("native extension unavailable (%s); using Python fallbacks", e)
        return None


def _load_or_build():
    import importlib.util

    suffix = sysconfig.get_config_var("EXT_SUFFIX")
    so_path = os.path.join(_BUILD_DIR, f"_byox_native{suffix}")
    if not (os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC)):
        os.makedirs(_BUILD_DIR, exist_ok=True)
        include = sysconfig.get_paths()["include"]
        cmd = [
            os.environ.get("CXX", "g++"), "-O2", "-shared", "-fPIC", "-std=c++17",
            f"-I{include}", _SRC, "-o", so_path,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        logger.info("built native extension at %s", so_path)
    spec = importlib.util.spec_from_file_location("_byox_native", so_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    sys.modules.setdefault("_byox_native", module)
    return module
