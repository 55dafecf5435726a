"""User-facing similarity entry points.

``similarity_mh`` / ``similarity_nw`` mirror the reference's R-level API
and defaults (R/RcppExports.R:15-17, 34-36):

    similarityMH(sequences, k = 4, n_hash = 50)
    similarityNW(sequences, matrixName = "BLOSUM62", gapOpen = 10, gapExt = 4)

and return dense symmetric [N, N] float64 matrices in [0, 1].  Extra
keyword-only arguments expose the TPU-native surface: an explicit RNG
``seed`` (the reference's hash family is nondeterministic,
src/minHash.cpp:73), device/mesh selection, and tiling knobs.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import blosum
from .encode import encode
from .ops import nw_batch, pick_nw_backend, tpu_available
from .ops.minhash import minhash_signatures, signature_similarity


def labels_1n(n: int) -> list[str]:
    """Reference-style dimnames "1".."n" (src/minHash.cpp:181-186)."""
    return [str(i + 1) for i in range(n)]


def similarity_mh(
    sequences: Sequence[str],
    k: int = 4,
    n_hash: int = 50,
    *,
    seed: int = 0,
    chunk: int = 512,
    block: int = 256,
) -> np.ndarray:
    """MinHash Jaccard-estimate similarity matrix (reference similarityMH).

    Validation mirrors src/minHash.cpp:121-131 (nonempty, k > 0,
    n_hash > 0).  Unlike the reference the result is reproducible: the
    murmur seed family is drawn from a seeded mt19937 bit-compatible with
    a seeded C++ HashFamily.
    """
    if len(sequences) == 0:
        raise ValueError("Input sequences vector cannot be empty")
    if k <= 0:
        raise ValueError("'k' must be a positive integer")
    if n_hash <= 0:
        raise ValueError("Number of hash functions must be positive")
    enc = encode(sequences, validate=False)  # MH hashes raw bytes; any
    # character is hashable (the reference accepts arbitrary strings too)
    sigs = minhash_signatures(
        enc.ascii, enc.lengths, k=k, n_hash=n_hash, seed=seed, chunk=chunk
    )
    return signature_similarity(sigs, block=block)


@functools.lru_cache(maxsize=64)
def _nw_tile_fn(tile: int, backend: str, gap_open: int, gap_ext: int):
    """Jitted [tile x tile] NW pair-block kernel, cached per config so
    repeated similarity_nw calls reuse the traced+compiled executable."""

    @jax.jit
    def tile_fn(seq_idx, lengths, sub, rows, cols):
        a = jnp.take(seq_idx, rows, axis=0)
        la = jnp.take(lengths, rows)
        b = jnp.take(seq_idx, cols, axis=0)
        lb = jnp.take(lengths, cols)
        a = jnp.repeat(a, tile, axis=0)
        la = jnp.repeat(la, tile)
        b = jnp.tile(b, (tile, 1))
        lb = jnp.tile(lb, (tile,))
        res = nw_batch(
            a, la, b, lb, sub,
            gap_open=gap_open, gap_ext=gap_ext, backend=backend,
        )
        return (
            res.matches.reshape(tile, tile),
            res.length.reshape(tile, tile),
        )

    return tile_fn


def _pick_tile(n: int, max_len: int) -> int:
    """Tile edge so the batch (tile^2 pairs) keeps the VPU busy without
    blowing HBM on long sequences."""
    budget = 1 << 21  # ~2M lane-elements per DP diagonal batch
    b = max(64, min(4096, budget // max(max_len, 16)))
    t = 1
    while t * t * 4 <= b:
        t *= 2
    return min(t, max(1, n))


def similarity_nw(
    sequences: Sequence[str],
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
    *,
    tile: int | None = None,
    progress: bool = False,
) -> np.ndarray:
    """Exact NW percent-identity similarity matrix (reference similarityNW).

    Bit-identical to the reference semantics (validated against the C++
    oracle): affine-gap Gotoh DP, traceback-path percent identity,
    priority D > U > L, border/interior gap asymmetry.  The all-pairs
    upper triangle (including the diagonal, src/pairwiseSeqAlign.cpp:342)
    is computed in [tile x tile] pair blocks, each a single batched
    wavefront kernel launch.
    """
    n = len(sequences)
    if n == 0:
        raise ValueError("Input sequences vector cannot be empty")
    sub = jnp.asarray(blosum.get_matrix(matrix_name))
    max_len = max(len(s) for s in sequences)
    # Pallas fast path wants lane-aligned DP rows: (padded_len + 1) % 128
    use_pallas = tpu_available() and 48 <= max_len <= 4000
    if use_pallas:
        pad_to = -(-(max_len + 1) // 128) * 128 - 1
        enc = encode(sequences, pad_to=pad_to)
        t = tile or 16  # 256 pairs/call fills the kernel's VMEM budget
        backend = "pallas"
    else:
        enc = encode(sequences, pad_multiple=8)
        t = tile or _pick_tile(n, enc.max_len)
        backend = pick_nw_backend(enc.max_len, enc.max_len)
    nb = -(-n // t)
    # pad index space so every block is full; padded entries masked later
    pad_n = nb * t
    seq_idx = jnp.asarray(enc.indices)
    lengths = jnp.asarray(enc.lengths)
    tile_fn = _nw_tile_fn(t, backend, gap_open, gap_ext)

    matches = np.zeros((pad_n, pad_n), dtype=np.int64)
    length = np.zeros((pad_n, pad_n), dtype=np.int64)
    coords = [
        (bi, bj) for bi in range(nb) for bj in range(bi, nb)
    ]
    block_ids = np.arange(pad_n, dtype=np.int32).reshape(nb, t) % n
    # pre-stage every tile's index vectors on device before the dispatch
    # loop: per-call device-side slicing or host conversion costs ~15 ms
    # each under the TPU relay, dwarfing the 14.6 ms kernel itself
    row_dev = [jnp.asarray(block_ids[b]) for b in range(nb)]
    pend_mt: list = []
    pend_ln: list = []
    for k, (bi, bj) in enumerate(coords):
        mt, ln = tile_fn(seq_idx, lengths, sub, row_dev[bi], row_dev[bj])
        pend_mt.append(mt)
        pend_ln.append(ln)
        if progress and (k + 1) % 50 == 0:
            print(f"nw: tile {k + 1}/{len(coords)}", flush=True)
    # one batched device->host transfer instead of one sync per tile
    all_mt = np.asarray(jnp.stack(pend_mt))
    all_ln = np.asarray(jnp.stack(pend_ln))
    for (bi, bj), mt, ln in zip(coords, all_mt, all_ln):
        sl_i = slice(bi * t, (bi + 1) * t)
        sl_j = slice(bj * t, (bj + 1) * t)
        matches[sl_i, sl_j] = mt
        length[sl_i, sl_j] = ln

    matches = matches[:n, :n]
    length = length[:n, :n]
    iu = np.triu_indices(n)
    sims = np.zeros((n, n), dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        vals = matches[iu].astype(np.float64) / length[iu]
    sims[iu] = vals
    sims.T[iu] = vals  # symmetric fill (src/pairwiseSeqAlign.cpp:349-350)
    return sims
