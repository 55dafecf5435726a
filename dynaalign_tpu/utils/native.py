"""Shared build-on-demand loader for OPTIONAL native kernels.

The repo carries three ctypes-bound C++ libraries (cpp/Makefile):
``liboracle.so`` (mandatory — its loader in :mod:`dynaalign_tpu.oracle`
raises on failure, since the oracle is the bit-exactness ground truth)
and two optional performance kernels, the MSA row DP and the greedy
Louvain pass, which silently fall back to their numpy reference paths
when g++/make are unavailable.  This helper holds the shared
build/load/fallback logic for the optional ones so fixes (stale-.so
rebuild, make invocation, failure set) live in one place.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable

_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "cpp",
)


def load_native_lib(
    so_name: str,
    src_name: str,
    setup: Callable[[ctypes.CDLL], None],
) -> ctypes.CDLL | None:
    """Build (if stale/missing) and load an optional native library.

    Returns the configured CDLL, or None when the toolchain or build is
    unavailable — callers fall back to their numpy reference path.
    ``setup`` installs the restype/argtypes signatures.
    """
    so = os.path.join(_CPP_DIR, so_name)
    src = os.path.join(_CPP_DIR, src_name)
    try:
        if not os.path.exists(so) or os.path.getmtime(
            so
        ) < os.path.getmtime(src):
            subprocess.run(
                ["make", "-C", _CPP_DIR, "-s", so_name], check=True
            )
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError):
        return None
    setup(lib)
    return lib
