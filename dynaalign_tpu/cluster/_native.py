"""ctypes loader for the native greedy Louvain pass (cpp/louvain_pass.cpp).

Build-on-demand like the oracle/MSA bindings; falls back to the numpy
per-node loop when g++/make are unavailable or the build fails, and can
be disabled with ``DYNAALIGN_LOUVAIN_NATIVE=0``.  The native pass is an
exact IEEE-double transcription of the numpy loop, so memberships are
bit-identical (tests/test_cluster.py asserts this).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "cpp"
)
_SO = os.path.join(_CPP_DIR, "liblouvain.so")


@functools.cache
def _lib() -> ctypes.CDLL | None:
    try:
        src = os.path.join(_CPP_DIR, "louvain_pass.cpp")
        if not os.path.exists(_SO) or os.path.getmtime(
            _SO
        ) < os.path.getmtime(src):
            subprocess.run(
                ["make", "-C", _CPP_DIR, "-s", "liblouvain.so"],
                check=True,
            )
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.SubprocessError):
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.dyna_louvain_pass.restype = ctypes.c_int64
    lib.dyna_louvain_pass.argtypes = [
        i64p, i64p, f64p, ctypes.c_int64, f64p,
        ctypes.c_double, ctypes.c_double,
        i64p, i64p, f64p,
    ]
    return lib


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

    ``comm`` (int64) and ``sum_tot`` (float64) are modified in place;
    ``DYNAALIGN_LOUVAIN_NATIVE=0`` is honored per call so tests can
    compare both paths in one process.
    """
    if os.environ.get("DYNAALIGN_LOUVAIN_NATIVE", "1") == "0":
        return None
    lib = _lib()
    if lib is None:
        return None
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
