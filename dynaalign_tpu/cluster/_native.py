"""ctypes loader for the native greedy Louvain pass (cpp/louvain_pass.cpp).

Build-on-demand via the shared optional-kernel loader
(utils/native.py); falls back to the numpy per-node loop when g++/make
are unavailable or the build fails, and can be disabled with
``DYNAALIGN_LOUVAIN_NATIVE=0``.  The native pass is an exact
IEEE-double transcription of the numpy loop, so memberships are
bit-identical (tests/test_cluster.py asserts this).
"""

from __future__ import annotations

import ctypes
import functools
import os

import numpy as np

from ..utils.native import load_native_lib


def _setup(lib: ctypes.CDLL) -> None:
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.dyna_louvain_pass.restype = ctypes.c_int64
    lib.dyna_louvain_pass.argtypes = [
        i64p, i64p, f64p, ctypes.c_int64, f64p,
        ctypes.c_double, ctypes.c_double,
        i64p, i64p, f64p,
    ]


@functools.cache
def _lib() -> ctypes.CDLL | None:
    return load_native_lib("liblouvain.so", "louvain_pass.cpp", _setup)


def louvain_native_available() -> bool:
    """Whether the native pass will actually run (env honored per call,
    so callers can skip ctypes-ready array staging on the numpy path)."""
    if os.environ.get("DYNAALIGN_LOUVAIN_NATIVE", "1") == "0":
        return False
    return _lib() is not None


def native_louvain_pass(
    indptr: np.ndarray,
    indices: np.ndarray,
    data: np.ndarray,
    strengths: np.ndarray,
    two_m: float,
    gamma: float,
    order: np.ndarray,
    comm: np.ndarray,
    sum_tot: np.ndarray,
) -> bool | None:
    """Run one greedy pass in place; returns whether any node moved, or
    None when the native kernel is unavailable.

    ``comm`` (int64) and ``sum_tot`` (float64) are modified in place.
    """
    if not louvain_native_available():
        return None
    lib = _lib()
    n = len(comm)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    moved = lib.dyna_louvain_pass(
        indptr.ctypes.data_as(i64p),
        indices.ctypes.data_as(i64p),
        data.ctypes.data_as(f64p),
        ctypes.c_int64(n),
        strengths.ctypes.data_as(f64p),
        ctypes.c_double(two_m),
        ctypes.c_double(gamma),
        order.ctypes.data_as(i64p),
        comm.ctypes.data_as(i64p),
        sum_tot.ctypes.data_as(f64p),
    )
    return bool(moved)
