"""ctypes bindings to the C++ CPU oracle (cpp/oracle.cpp).

The oracle pins down the bit-exact semantics of MinHash (murmur3 + seeded
hash family, reference src/minHash.cpp) and NW percent-identity (reference
src/pairwiseSeqAlign.cpp) and serves as the Rcpp-equivalent CPU baseline for
benchmarks.  Built on demand with `make -C cpp` (g++; no pybind11 needed).
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "cpp")
_SO = os.path.join(_CPP_DIR, "liboracle.so")


def _build() -> None:
    subprocess.run(["make", "-C", _CPP_DIR, "-s"], check=True)


@functools.cache
def _lib() -> ctypes.CDLL:
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        os.path.join(_CPP_DIR, "oracle.cpp")
    ):
        _build()
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f64p = ctypes.POINTER(ctypes.c_double)

    lib.dyna_murmur3_32.restype = ctypes.c_uint32
    lib.dyna_murmur3_32.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]

    lib.dyna_hash_family.restype = None
    lib.dyna_hash_family.argtypes = [ctypes.c_int, ctypes.c_uint32, u32p]

    lib.dyna_minhash_signatures.restype = None
    lib.dyna_minhash_signatures.argtypes = [
        u8p, i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, u32p,
    ]

    lib.dyna_minhash_similarity_from_sigs.restype = None
    lib.dyna_minhash_similarity_from_sigs.argtypes = [
        u32p, ctypes.c_int64, ctypes.c_int, f64p,
    ]

    lib.dyna_minhash_similarity.restype = None
    lib.dyna_minhash_similarity.argtypes = [
        u8p, i64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint32, f64p,
    ]

    lib.dyna_nw_pair.restype = ctypes.c_int
    lib.dyna_nw_pair.argtypes = [
        u8p, ctypes.c_int, u8p, ctypes.c_int, ctypes.c_char_p,
        ctypes.c_int, ctypes.c_int, f64p,
    ]

    lib.dyna_nw_allpairs.restype = ctypes.c_int
    lib.dyna_nw_allpairs.argtypes = [
        u8p, i64p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, f64p,
    ]
    return lib


def _flatten(sequences: list[str]) -> tuple[np.ndarray, np.ndarray]:
    data = np.frombuffer(
        ("".join(sequences)).encode("ascii"), dtype=np.uint8
    ).copy()
    offsets = np.zeros(len(sequences) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in sequences], out=offsets[1:])
    return data, offsets


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def murmur3_32(key: bytes, seed: int) -> int:
    buf = np.frombuffer(key, dtype=np.uint8).copy()
    if len(buf) == 0:
        buf = np.zeros(1, dtype=np.uint8)
    return int(_lib().dyna_murmur3_32(_u8p(buf), len(key), seed & 0xFFFFFFFF))


def hash_family(n_hash: int, seed: int) -> np.ndarray:
    out = np.zeros(n_hash, dtype=np.uint32)
    _lib().dyna_hash_family(
        n_hash, seed & 0xFFFFFFFF,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def minhash_signatures(
    sequences: list[str], k: int, n_hash: int, seed: int
) -> np.ndarray:
    data, offsets = _flatten(sequences)
    out = np.zeros((len(sequences), n_hash), dtype=np.uint32)
    _lib().dyna_minhash_signatures(
        _u8p(data),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(sequences), k, n_hash, seed & 0xFFFFFFFF,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def minhash_similarity(
    sequences: list[str], k: int = 4, n_hash: int = 50, seed: int = 0
) -> np.ndarray:
    data, offsets = _flatten(sequences)
    n = len(sequences)
    out = np.zeros((n, n), dtype=np.float64)
    _lib().dyna_minhash_similarity(
        _u8p(data),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, k, n_hash, seed & 0xFFFFFFFF,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def nw_pair(
    s1: str, s2: str, matrix_name: str = "BLOSUM62",
    gap_open: int = 10, gap_ext: int = 4,
) -> float:
    b1 = np.frombuffer(s1.encode("ascii"), dtype=np.uint8).copy()
    b2 = np.frombuffer(s2.encode("ascii"), dtype=np.uint8).copy()
    out = ctypes.c_double(0.0)
    rc = _lib().dyna_nw_pair(
        _u8p(b1), len(b1), _u8p(b2), len(b2), matrix_name.encode(),
        gap_open, gap_ext, ctypes.byref(out),
    )
    if rc == -2:
        raise ValueError(f"Invalid substitution matrix name: {matrix_name}")
    if rc != 0:
        raise ValueError("Invalid amino acid in sequence")
    return out.value


def nw_similarity(
    sequences: list[str], matrix_name: str = "BLOSUM62",
    gap_open: int = 10, gap_ext: int = 4, n_threads: int = 1,
) -> np.ndarray:
    """All-pairs NW percent-identity matrix.

    n_threads=1 is the serial reference-equivalent baseline
    (the reference's similarityNW driver is single-threaded,
    src/pairwiseSeqAlign.cpp:340-352); n_threads=0 uses all cores.
    """
    data, offsets = _flatten(sequences)
    n = len(sequences)
    out = np.zeros((n, n), dtype=np.float64)
    rc = _lib().dyna_nw_allpairs(
        _u8p(data),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, matrix_name.encode(), gap_open, gap_ext, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc == -2:
        raise ValueError(f"Invalid substitution matrix name: {matrix_name}")
    if rc != 0:
        raise ValueError("Invalid amino acid in sequence")
    return out
