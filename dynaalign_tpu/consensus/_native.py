"""ctypes loader for the native MSA profile-DP kernel (cpp/msa_dp.cpp).

Build-on-demand via the shared optional-kernel loader
(utils/native.py); falls back to the numpy row DP when g++/make are
unavailable or the build fails, and can be disabled with
``DYNAALIGN_MSA_NATIVE=0``.  The native kernel is an exact IEEE-double
transcription of the numpy formulation, so tracebacks are
bit-identical (tests/test_consensus.py asserts this).
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

from ..utils.native import load_native_lib


def _setup(lib: ctypes.CDLL) -> None:
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.dyna_msa_row_dp.restype = None
    lib.dyna_msa_row_dp.argtypes = [
        f64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, u8p,
    ]


@functools.cache
def _lib() -> ctypes.CDLL | None:
    return load_native_lib("libmsadp.so", "msa_dp.cpp", _setup)


def native_row_dp(
    score_rows: np.ndarray, go: float, ge: float
) -> np.ndarray | None:
    """Native traceback matrix, or None when the kernel is unavailable.

    ``DYNAALIGN_MSA_NATIVE=0`` is honored per call (not cached) so tests
    can compare both paths in one process.
    """
    if os.environ.get("DYNAALIGN_MSA_NATIVE", "1") == "0":
        return None
    lib = _lib()
    if lib is None:
        return None
    sr = np.ascontiguousarray(score_rows, dtype=np.float64)
    m, n = sr.shape
    tb = np.zeros((m + 1, n + 1), dtype=np.uint8)
    lib.dyna_msa_row_dp(
        sr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(m),
        ctypes.c_int64(n),
        ctypes.c_double(go),
        ctypes.c_double(ge),
        tb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return tb
