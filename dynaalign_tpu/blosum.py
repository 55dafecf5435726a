"""BLOSUM substitution matrices as device-ready arrays.

The six standard BLOSUM tables (45/50/62/80/90/100; Henikoff & Henikoff
1992) over the 24-symbol alphabet of :mod:`dynaalign_tpu.encode`.  Values
match the reference's hardcoded tables (src/pairwiseSeqAlign.cpp:23-186);
they are bundled as ``_blosum_tables.npz`` (extracted programmatically, see
tools/extract_blosum.py).

``get_matrix`` mirrors the reference's ``getSubstitutionMatrix`` dispatch
(src/pairwiseSeqAlign.cpp:190-206): all six names are valid, unknown names
raise.  Matrices are returned padded to 32x32 (power-of-two, covers PAD_ID
rows/cols with zeros) so TPU one-hot lookups hit aligned shapes.
"""

from __future__ import annotations

import functools
import os

import numpy as np

from .encode import ALPHABET_SIZE

_NPZ = os.path.join(os.path.dirname(__file__), "_blosum_tables.npz")

MATRIX_NAMES = (
    "BLOSUM45",
    "BLOSUM50",
    "BLOSUM62",
    "BLOSUM80",
    "BLOSUM90",
    "BLOSUM100",
)

PADDED_SIZE = 32  # next power of two above 24; PAD_ID rows are zero


@functools.cache
def _tables() -> dict[str, np.ndarray]:
    with np.load(_NPZ) as z:
        return {k: z[k].astype(np.int32) for k in z.files}


def get_matrix(name: str = "BLOSUM62", *, padded: bool = True) -> np.ndarray:
    """Return a BLOSUM table by name.

    Args:
      name: one of MATRIX_NAMES (reference dispatch:
        src/pairwiseSeqAlign.cpp:190-206).
      padded: if True (default) return a 32x32 int32 array with the 24x24
        table in the top-left corner and zeros elsewhere; otherwise the raw
        24x24 table.

    Raises:
      ValueError: for unknown names (reference ``Rcpp::stop`` at :204).
    """
    tables = _tables()
    if name not in tables:
        raise ValueError(f"Invalid substitution matrix name: {name}")
    mat = tables[name]
    if not padded:
        return mat.copy()
    out = np.zeros((PADDED_SIZE, PADDED_SIZE), dtype=np.int32)
    out[:ALPHABET_SIZE, :ALPHABET_SIZE] = mat
    return out
