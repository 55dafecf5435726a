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
from .encode import bucket_by_length, encode
from .ops import (
    PALLAS_MAX_MP1,
    nw_batch,
    nw_batch_tiled,
    nw_i16_ok,
    pick_nw_backend,
    tpu_available,
)
from .ops.minhash import minhash_signatures, signature_similarity

# bucket edges one below a sublane multiple so (padded_len + 1) % 8 == 0
# and the Pallas kernel stays eligible for every bucket-pair shape
PALLAS_BUCKET_EDGES = (
    15, 31, 63, 127, 255, 383, 511, 639, 767, 1023, 1535, 2047
)
# VMEM budget: state planes + the in-kernel substitution slab (24 bytes
# per cell, ops/nw_pallas.py) + Mosaic temporaries must fit scoped VMEM.
# The pre-round-3 budget of 128k cells overflowed once the slab moved
# into VMEM: Mosaic measured 17.48 MB of stack at (mp1=17, B=8192)
# against the 16 MB limit on the hybrid rescore path.  96k cells keeps
# the same shape at ~13.1 MB with headroom for temporaries.
# Round-5: 80k (was 98,304).  The r5 step body's extra int32 scratch
# plane plus relay-pool variance made the old budget overflow on some
# terminals: at 104,448 cells one terminal measured 18.88 MB of Mosaic
# stack against the 16 MB limit (~181 stack-bytes/cell), so the budget
# now targets ~14.5 MB on that worst-case accounting.
_SHORT_CELL_BUDGET = 80_000


def _short_batch(mp1: int, lo: int = 256, hi: int = 8192) -> int:
    """Largest 128-multiple pair batch within the short-kernel VMEM budget."""
    return int(np.clip(_SHORT_CELL_BUDGET // mp1 // 128 * 128, lo, hi))


# HBM budget for one tiled kernel launch's scoring inputs (the
# [T, 6, Mp1, B] int32 substitution slab + [T, D, B] int32 b-char
# stream) — bounds how many pair tiles ride one dispatch
_TILED_SD_BUDGET = 2 << 30

# long-regime all-pairs sweeps that would issue more than this many
# kernel launches route through the single-dispatch fused path instead
# (parallel.sharded_nw_allpairs on a 1x1 mesh): per-launch dispatch is a
# host->device RPC under the TPU relay, and shared-relay load windows
# inflate it ~10x for minutes at a time — the direct driver measured
# 60.7k pairs/s quiet vs 3.8k loaded at n=256 (136 launches) while the
# fused driver held 59.2k -> 19k in the same windows (docs/PERF.md
# "Load windows").  DYNAALIGN_NW_FUSED=0 forces direct, =1 forces fused.
_FUSED_LAUNCH_THRESHOLD = 24


def _tiles_per_launch(
    m: int, n: int, bsz: int, n_tiles: int, backend: str = "pallas_short"
) -> int:
    """How many pair tiles to fold into one kernel launch.

    Only the short regime stacks tiles: its per-tile kernel time is
    microseconds, so dispatch dominates and folding the tile loop into
    the Pallas grid wins.  Long-regime tiles run ~3 ms each on device;
    async per-call dispatch pipelines those launches, and stacking
    serializes them instead.  Re-probed after the round-3 in-kernel
    score generation (same loaded relay window): tc=8 15.5k < tc=4
    21.8k < tc=1 pairs/s — the round-2 conclusion holds without the
    prepass too.  Override with DYNAALIGN_NW_TC to re-probe.
    """
    if not backend.startswith("pallas"):
        return 1
    import os

    override = os.environ.get("DYNAALIGN_NW_TC")
    if override:
        return int(np.clip(int(override), 1, n_tiles))
    if backend != "pallas_short":
        return 1
    per_tile = (24 * (m + 1) + 4 * (m + n + 2)) * bsz  # slab + bstream
    return int(np.clip(_TILED_SD_BUDGET // max(per_tile, 1), 1, n_tiles))


def labels_1n(n: int) -> list[str]:
    """Reference-style dimnames "1".."n" (src/minHash.cpp:181-186)."""
    return [str(i + 1) for i in range(n)]


def similarity_mh(
    sequences: Sequence[str],
    k: int = 4,
    n_hash: int = 50,
    *,
    seed: int = 0,
    chunk: int | None = None,
    block: int = 256,
) -> np.ndarray:
    """MinHash Jaccard-estimate similarity matrix (reference similarityMH).

    ``chunk=None`` auto-sizes the signature-build chunks to HBM
    (ops.minhash.minhash_signatures); the fused single-dispatch path is
    taken below 1,024 sequences regardless.

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
    n = enc.n
    fuse_below = 2 * chunk if chunk is not None else 1024
    if n <= fuse_below and enc.max_len >= k:
        # small workloads: one fused dispatch (signatures + agreement)
        # instead of several round trips under the TPU relay
        from .ops.minhash import _fused_mh_kernel
        from .utils import hash_family_seeds

        n_pad = -(-n // block) * block
        ascii_p = np.zeros((n_pad, enc.ascii.shape[1]), dtype=np.uint8)
        ascii_p[:n] = enc.ascii
        len_p = np.zeros(n_pad, dtype=np.int32)
        len_p[:n] = enc.lengths
        valid = np.zeros(n_pad, dtype=bool)
        valid[:n] = True
        counts = _fused_mh_kernel(
            jnp.asarray(ascii_p), jnp.asarray(len_p),
            jnp.asarray(hash_family_seeds(n_hash, seed)),
            jnp.asarray(valid), k=k, block=block,
        )  # int16 (narrowed inside the fused program; value-exact)
        sims = np.asarray(counts)[:n, :n].astype(np.float64) / float(
            n_hash
        )
        np.fill_diagonal(sims, 1.0)
        return sims
    sigs = minhash_signatures(
        enc.ascii, enc.lengths, k=k, n_hash=n_hash, seed=seed, chunk=chunk
    )
    return signature_similarity(sigs, block=block)


class MinHashEngine:
    """Signature-caching MinHash similarity engine for recursive drivers.

    ``similarity_mh`` rebuilds per-sequence signatures on every call, so
    a recursive driver like :func:`dynaalign_tpu.cluster.clusterbreak`
    pays the whole signature dispatch chain once per recursion subset —
    the measured round-4 bottleneck (160 seqs/s from an engine doing
    7.7M MH pairs/s).  A sequence's signature depends only on
    (sequence, k, n_hash, seed) — NOT on which batch it is computed in
    (src/minHash.cpp:143-157 is per-sequence) — so this engine builds
    signatures ONCE for the full set and serves any subset's similarity
    matrix from the cached rows with a single agreement dispatch.
    Bit-identical to ``similarity_mh`` on the same subset
    (tests/test_cluster.py).

    Duplicate sequences share one signature row (same string -> same
    signature, exactly as recomputation would give).  Calling it with a
    sequence outside the constructor set raises KeyError.

    Usage: ``clusterbreak(pep, sim_fn=MinHashEngine(pep, k=2))`` — or
    just leave ``sim_fn=None``; clusterbreak builds one automatically.
    """

    def __init__(
        self,
        sequences: Sequence[str],
        k: int = 4,
        n_hash: int = 50,
        *,
        seed: int = 0,
        chunk: int | None = None,
        block: int = 256,
        cache_counts: bool | None = None,
    ):
        if len(sequences) == 0:
            raise ValueError("Input sequences vector cannot be empty")
        if k <= 0:
            raise ValueError("'k' must be a positive integer")
        if n_hash <= 0:
            raise ValueError("Number of hash functions must be positive")
        enc = encode(sequences, validate=False)
        sigs = minhash_signatures(
            enc.ascii, enc.lengths, k=k, n_hash=n_hash, seed=seed,
            chunk=chunk,
        )
        self._sigs = np.asarray(sigs)
        self._index: dict[str, int] = {}
        for i, s in enumerate(sequences):
            self._index.setdefault(str(s), i)
        self.k = k
        self.n_hash = n_hash
        self.seed = seed
        self._block = block
        # full-matrix count cache: clusterbreak's recursion subsets are
        # all subsets of ONE set, so every subset similarity is a slice
        # of the full [N, N] agreement counts — computed on device once
        # and fetched as int16 (counts <= n_hash <= 32767; the relay
        # fetch, not the compare kernel, dominates agreement time, and
        # int16 halves it).  Auto-on up to 16,384 rows (512 MB int16).
        if cache_counts is None:
            cache_counts = len(self._sigs) <= 16384
        self._cache_counts = cache_counts
        self._counts: np.ndarray | None = None

    def _full_counts(self) -> np.ndarray:
        if self._counts is None:
            from .ops.minhash import signature_agreement_counts

            dev = signature_agreement_counts(
                jnp.asarray(self._sigs), block=self._block
            )
            # n_hash <= 255 is already uint8; narrow int32 -> int16
            # (never widen — counts <= n_hash are value-exact at any
            # of these widths)
            if dev.dtype == jnp.int32 and self.n_hash < 32768:
                dev = dev.astype(jnp.int16)
            self._counts = np.asarray(dev)
        return self._counts

    def __call__(self, subset: Sequence[str]) -> np.ndarray:
        if len(subset) == 0:
            raise ValueError("Input sequences vector cannot be empty")
        try:
            rows = np.array(
                [self._index[str(s)] for s in subset], dtype=np.int64
            )
        except KeyError as e:
            raise KeyError(
                f"sequence {e.args[0]!r} not in this MinHashEngine's "
                "signature set"
            ) from None
        if self._cache_counts:
            c = self._full_counts()[np.ix_(rows, rows)]
            sims = c.astype(np.float64) / float(self.n_hash)
            np.fill_diagonal(sims, 1.0)
            return sims
        return signature_similarity(
            self._sigs[rows], block=self._block
        )


@functools.lru_cache(maxsize=64)
def _nw_tile_fn(
    tile_i: int, tile_j: int, backend: str, gap_open: int, gap_ext: int
):
    """Jitted [tile_i x tile_j] NW pair-block kernel, cached per config so
    repeated similarity_nw calls reuse the traced+compiled executable.
    Row ids index the first encoded set, col ids the second (the two sets
    coincide for the square all-pairs driver)."""

    @jax.jit
    def tile_fn(seq_a, len_a, seq_b, len_b, sub, rows, cols):
        a = jnp.take(seq_a, rows, axis=0)
        la = jnp.take(len_a, rows)
        b = jnp.take(seq_b, cols, axis=0)
        lb = jnp.take(len_b, cols)
        a = jnp.repeat(a, tile_j, axis=0)
        la = jnp.repeat(la, tile_j)
        b = jnp.tile(b, (tile_i, 1))
        lb = jnp.tile(lb, (tile_i,))
        res = nw_batch(
            a, la, b, lb, sub,
            gap_open=gap_open, gap_ext=gap_ext, backend=backend,
        )
        return (
            res.matches.reshape(tile_i, tile_j),
            res.length.reshape(tile_i, tile_j),
        )

    return tile_fn


@functools.lru_cache(maxsize=64)
def _nw_tile_stack_fn(
    t: int, backend: str, gap_open: int, gap_ext: int, i16: bool = False
):
    """Jitted multi-tile NW sweep: a [Tc, t] x [Tc, t] stack of pair
    blocks in ONE device dispatch (the tiled Pallas grid runs the blocks
    back-to-back, so per-launch overhead is paid once per stack)."""

    @jax.jit
    def fn(seq, lens, sub, rows, cols):  # rows/cols int32 [Tc, t]
        tc = rows.shape[0]
        a = jnp.take(seq, rows.reshape(-1), axis=0).reshape(tc, t, -1)
        la = jnp.take(lens, rows.reshape(-1)).reshape(tc, t)
        b = jnp.take(seq, cols.reshape(-1), axis=0).reshape(tc, t, -1)
        lb = jnp.take(lens, cols.reshape(-1)).reshape(tc, t)
        res = nw_batch_tiled(
            jnp.repeat(a, t, axis=1),
            jnp.repeat(la, t, axis=1),
            jnp.tile(b, (1, t, 1)),
            jnp.tile(lb, (1, t)),
            sub,
            gap_open=gap_open, gap_ext=gap_ext, backend=backend,
            score_i16=i16,
        )
        return (
            res.matches.reshape(tc, t, t),
            res.length.reshape(tc, t, t),
        )

    return fn


def _pick_tile(n: int, max_len: int) -> int:
    """Tile edge so the batch (tile^2 pairs) keeps the VPU busy without
    blowing HBM on long sequences."""
    budget = 1 << 21  # ~2M lane-elements per DP diagonal batch
    b = max(64, min(4096, budget // max(max_len, 16)))
    t = 1
    while t * t * 4 <= b:
        t *= 2
    return min(t, max(1, n))


@functools.lru_cache(maxsize=64)
def _nw_pairlist_fn(backend: str, gap_open: int, gap_ext: int):
    """Jitted explicit-pair-list NW kernel over two encoded sets,
    cached per config (and per shape via jit)."""

    @jax.jit
    def fn(seq_a, len_a, seq_b, len_b, sub, rows, cols):
        res = nw_batch(
            jnp.take(seq_a, rows, axis=0),
            jnp.take(len_a, rows),
            jnp.take(seq_b, cols, axis=0),
            jnp.take(len_b, cols),
            sub,
            gap_open=gap_open, gap_ext=gap_ext, backend=backend,
        )
        return res.matches, res.length

    return fn


@functools.lru_cache(maxsize=64)
def _nw_pairlist_stack_fn(
    backend: str, gap_open: int, gap_ext: int, i16: bool = False
):
    """Jitted [Tc, B] pair-list stacks — Tc batches per device dispatch."""

    @jax.jit
    def fn(seq_a, len_a, seq_b, len_b, sub, rows, cols):  # [Tc, B]
        tc, bsz = rows.shape
        res = nw_batch_tiled(
            jnp.take(seq_a, rows.reshape(-1), axis=0).reshape(
                tc, bsz, -1
            ),
            jnp.take(len_a, rows.reshape(-1)).reshape(tc, bsz),
            jnp.take(seq_b, cols.reshape(-1), axis=0).reshape(
                tc, bsz, -1
            ),
            jnp.take(len_b, cols.reshape(-1)).reshape(tc, bsz),
            sub,
            gap_open=gap_open, gap_ext=gap_ext, backend=backend,
            score_i16=i16,
        )
        return res.matches, res.length

    return fn


def similarity_nw_bucketed(
    sequences: Sequence[str],
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
    *,
    bucket_edges: Sequence[int] = PALLAS_BUCKET_EDGES,
    batch: int = 256,
) -> np.ndarray:
    """Length-bucketed exact NW all-pairs (SURVEY.md §7 hard part 7).

    Sequences are grouped into padded length buckets and every pair is
    computed at its bucket-pair's (smaller) padded shape, so mixed
    workloads (12-mer probes + ~566 aa proteins) don't pay worst-case
    padding on every pair.  Bit-identical to :func:`similarity_nw`: each
    pair keeps the reference's orientation (the smaller global index is
    sequence1 — tie-breaking is not symmetric under swapping, so this
    matters, src/pairwiseSeqAlign.cpp:340-343).
    """
    seqs = list(sequences)
    n = len(seqs)
    if n == 0:
        raise ValueError("Input sequences vector cannot be empty")
    sub_np = blosum.get_matrix(matrix_name)
    sub = jnp.asarray(sub_np)
    buckets = bucket_by_length(seqs, bucket_edges=bucket_edges)
    which = np.zeros(n, dtype=np.int64)  # global index -> bucket id
    local = np.zeros(n, dtype=np.int64)  # global index -> index in bucket
    devs = []
    for b, (pos, enc_b) in enumerate(buckets):
        which[pos] = b
        local[pos] = np.arange(len(pos))
        devs.append((
            jnp.asarray(enc_b.indices), jnp.asarray(enc_b.lengths)
        ))

    # group ordered pairs (i < j) by their (bucket_i, bucket_j) shape
    iu = np.triu_indices(n)  # includes the diagonal, like the reference
    groups: dict[tuple[int, int], list[int]] = {}
    for p, (gi, gj) in enumerate(zip(iu[0], iu[1])):
        groups.setdefault((which[gi], which[gj]), []).append(p)

    matches = np.zeros((n, n), dtype=np.int64)
    length = np.zeros((n, n), dtype=np.int64)
    for (ba, bb), plist in groups.items():
        gi = iu[0][plist]
        gj = iu[1][plist]
        rows = local[gi].astype(np.int32)
        cols = local[gj].astype(np.int32)
        npairs = len(rows)
        m_a = buckets[ba][1].max_len
        m_b_len = buckets[bb][1].max_len
        backend = pick_nw_backend(m_a, m_b_len)
        i16 = backend.startswith("pallas") and nw_i16_ok(
            m_a, m_b_len, gap_open, gap_ext, sub_np
        )
        # short-kernel groups take much larger pair batches (pairs ride
        # the lane axis, so VMEM scales with rows+1, not 128 lanes)
        grp_batch = (
            _short_batch(m_a + 1) if backend == "pallas_short" else batch
        )
        n_tiles = -(-npairs // grp_batch)
        tc = _tiles_per_launch(
            m_a, buckets[bb][1].max_len, grp_batch, n_tiles, backend
        )
        n_tiles = -(-n_tiles // tc) * tc  # whole launches, one jit shape
        pad = n_tiles * grp_batch
        rows = np.pad(rows, (0, pad - npairs)).reshape(n_tiles, grp_batch)
        cols = np.pad(cols, (0, pad - npairs)).reshape(n_tiles, grp_batch)
        fn = _nw_pairlist_stack_fn(backend, gap_open, gap_ext, i16)
        seq_a, len_a = devs[ba]
        seq_b, len_b = devs[bb]
        # pre-stage ALL index stacks in one host->device transfer each
        # (loop-interior transfers serialize against the compute queue
        # under the TPU relay); per-launch slices are device-side
        n_launch = n_tiles // tc
        rows_all = jnp.asarray(rows.reshape(n_launch, tc, grp_batch))
        cols_all = jnp.asarray(cols.reshape(n_launch, tc, grp_batch))
        pend = []
        for s in range(n_launch):
            pend.append(
                fn(seq_a, len_a, seq_b, len_b, sub, rows_all[s],
                   cols_all[s])
            )
        mt = np.asarray(
            jnp.concatenate([p[0].reshape(-1) for p in pend])
        )[:npairs]
        ln = np.asarray(
            jnp.concatenate([p[1].reshape(-1) for p in pend])
        )[:npairs]
        matches[gi, gj] = mt
        length[gi, gj] = ln
        matches[gj, gi] = mt
        length[gj, gi] = ln
    with np.errstate(invalid="ignore", divide="ignore"):
        return matches.astype(np.float64) / length


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
    sub_np = blosum.get_matrix(matrix_name)
    sub = jnp.asarray(sub_np)
    max_len = max(len(s) for s in sequences)
    if tpu_available() and max_len <= 127:
        # short fast path: pairs on the lane axis, sublane-aligned rows
        pad_to = -(-(max_len + 1) // 8) * 8 - 1
        enc = encode(sequences, pad_to=pad_to)
        # t^2 pairs per call within the short kernel's VMEM cell budget
        t = tile or max(
            16,
            min(64, int(np.sqrt(_short_batch(pad_to + 1))) // 16 * 16),
        )
        backend = "pallas_short"
    elif tpu_available() and max_len < PALLAS_MAX_MP1 - 8:
        # long fast path: pairs on lanes, sublane-aligned DP rows —
        # (padded_len+1) % 8 wastes far less grid than the old % 128
        pad_to = -(-(max_len + 1) // 8) * 8 - 1
        enc = encode(sequences, pad_to=pad_to)
        t = tile or 16  # 256 pairs/call fills the kernel's VMEM budget
        backend = "pallas"
    else:
        # multi-kilobase sequences route through pick_nw_backend, which
        # selects the transposed xl Pallas layout up to padded m+n <
        # 32768 / mp1 <= XL_MAX_MP1 (round 5) and scan beyond
        enc = encode(sequences, pad_multiple=8)
        t = tile or _pick_tile(n, enc.max_len)
        backend = pick_nw_backend(enc.max_len, enc.max_len)
    nb = -(-n // t)
    if backend == "pallas":
        # the long regime runs one launch per pair tile (tc == 1,
        # _tiles_per_launch); past the threshold, route through the
        # fused single-dispatch sharded driver on a 1x1 mesh — the same
        # stacked/banded/i16 kernels inside ONE XLA program per ~1024
        # tiles, bit-exact vs this driver (tests/test_parallel.py,
        # tests/test_api_surface.py fused-routing test, and bench.py's
        # fused_equals_direct field every run) and ~5x more robust to
        # relay load windows (see _FUSED_LAUNCH_THRESHOLD).
        import os as _os

        env = _os.environ.get("DYNAALIGN_NW_FUSED", "")
        if env != "0" and (
            env == "1"
            or nb * (nb + 1) // 2 > _FUSED_LAUNCH_THRESHOLD
        ):
            from jax.sharding import Mesh

            from .parallel import sharded_nw_allpairs

            # the sharded driver re-picks its backend from the pair
            # batch (tile^2); a user tile whose square is not a
            # 128-multiple would silently drop the sweep to the scan
            # backend, so the fused route uses its own tile — the tile
            # is a blocking knob, not part of the result
            t_fused = t if (t * t) % 128 == 0 else 16
            mesh_1x1 = Mesh(
                np.array(jax.devices()[:1]).reshape(1, 1),
                ("rows", "cols"),
            )
            return sharded_nw_allpairs(
                enc.indices, enc.lengths, sub_np,
                tile=t_fused, gap_open=gap_open, gap_ext=gap_ext,
                mesh=mesh_1x1, progress=progress,
            )
    # pad index space so every block is full; padded entries masked later
    pad_n = nb * t
    seq_idx = jnp.asarray(enc.indices)
    lengths = jnp.asarray(enc.lengths)

    matches = np.zeros((pad_n, pad_n), dtype=np.int64)
    length = np.zeros((pad_n, pad_n), dtype=np.int64)
    coords = [
        (bi, bj) for bi in range(nb) for bj in range(bi, nb)
    ]
    block_ids = np.arange(pad_n, dtype=np.int32).reshape(nb, t) % n
    # fold as many tiles as the HBM score-diagonal budget allows into
    # each kernel launch — per-launch dispatch (an RPC under the TPU
    # relay) dominates end-to-end time, so fewer launches = faster
    tc = _tiles_per_launch(
        enc.max_len, enc.max_len, t * t, len(coords), backend
    )
    padded = coords + [(0, 0)] * (-len(coords) % tc)
    i16 = backend.startswith("pallas") and nw_i16_ok(
        enc.max_len, enc.max_len, gap_open, gap_ext, sub_np
    )
    stack_fn = _nw_tile_stack_fn(t, backend, gap_open, gap_ext, i16)
    # pre-stage ALL launch index arrays in ONE host->device transfer
    # (every host->device transfer is its own RPC under the TPU relay —
    # two small transfers per launch used to add several ms each); the
    # per-launch slices below are device-side ops that pipeline with
    # the kernels
    chunks = [padded[s : s + tc] for s in range(0, len(padded), tc)]
    rows_all = jnp.asarray(
        np.stack([block_ids[[c[0] for c in ch]] for ch in chunks])
    )
    cols_all = jnp.asarray(
        np.stack([block_ids[[c[1] for c in ch]] for ch in chunks])
    )
    pend = []
    for k in range(len(chunks)):
        pend.append(
            stack_fn(seq_idx, lengths, sub, rows_all[k], cols_all[k])
        )
        if progress:
            print(
                f"nw: launch {k + 1}/{len(chunks)} ({tc} tiles each)",
                flush=True,
            )
    # one batched device->host transfer instead of one sync per launch
    # (each fetch is its own RPC under the TPU relay, ~tens of ms)
    all_mt = np.asarray(jnp.concatenate([p[0] for p in pend]))
    all_ln = np.asarray(jnp.concatenate([p[1] for p in pend]))
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
