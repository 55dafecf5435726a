"""MinHash signature + signature-agreement kernels (JAX, TPU-first).

Behavioural spec: reference src/minHash.cpp:119-188 (``similarityMH``).
The reference's two hot loops map to two jitted kernels:

* HOT LOOP 1 (signature build, src/minHash.cpp:143-157) becomes a single
  ``[N, P, H]`` hash tensor min-reduced over window positions — an
  embarrassingly parallel VPU map, chunked over N to bound memory.
* HOT LOOP 2 (pair similarity, src/minHash.cpp:160-178) becomes a blocked
  all-pairs signature-agreement count: for each row block, compare
  ``[TI, 1, H] == [1, N, H]`` and mean-reduce — XLA fuses the compare and
  reduction so the [TI, N, H] intermediate never materializes.

Edge-case parity (preserved deliberately, see SURVEY.md §2 #8): a sequence
shorter than k keeps the all-UINT32_MAX init signature and therefore scores
similarity 1.0 against any other too-short sequence.

Reproducibility: unlike the reference (seeded from std::random_device,
src/minHash.cpp:73), the hash family here takes an explicit ``seed``
(default 0) drawn through an mt19937 bit-compatible with a seeded build of
the reference (utils/mt19937.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.mt19937 import hash_family_seeds
from .murmur3 import murmur3_kmer_hashes

# numpy scalar, NOT jnp: a device constant at import time would
# initialise the XLA backend before jax.distributed.initialize() can run
_UINT32_MAX = np.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k",))
def _signatures_kernel(
    ascii_tokens: jnp.ndarray,  # uint8 [N, L]
    lengths: jnp.ndarray,  # int32 [N]
    seeds: jnp.ndarray,  # uint32 [H]
    *,
    k: int,
) -> jnp.ndarray:  # uint32 [N, H]
    hashes = murmur3_kmer_hashes(ascii_tokens, k, seeds)  # [N, P, H]
    p = hashes.shape[1]
    pos = jnp.arange(p, dtype=jnp.int32)[None, :]
    valid = (pos + k) <= lengths[:, None]  # [N, P]
    hashes = jnp.where(valid[:, :, None], hashes, _UINT32_MAX)
    return jnp.min(hashes, axis=1)


def minhash_signatures(
    ascii_tokens: np.ndarray | jnp.ndarray,
    lengths: np.ndarray | jnp.ndarray,
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    chunk: int | None = None,
) -> jnp.ndarray:
    """MinHash signatures [N, H] for a padded ascii batch.

    Chunked over sequences so the [chunk, P, H] hash tensor stays well
    under HBM limits for long-sequence workloads.  ``chunk=None``
    (default) sizes chunks to a ~256 MB hash tensor (HBM is 16 GB;
    every extra dispatch is a relay RPC, so fewer-larger wins), rounded
    to a power of two in [64, 131072] so the compiled-shape family
    stays small (the floor is 64 rows so the target holds even for
    multi-kilobase proteins at large n_hash; below that the tensor can
    exceed the target, but only by the one-row minimum).
    """
    if k <= 0:
        raise ValueError("'k' must be a positive integer")
    if n_hash <= 0:
        raise ValueError("Number of hash functions must be positive")
    ascii_tokens = jnp.asarray(ascii_tokens, dtype=jnp.uint8)
    lengths = jnp.asarray(lengths, dtype=jnp.int32)
    n, length = ascii_tokens.shape
    if length < k:
        # every sequence is shorter than k: all-max signatures
        return jnp.full((n, n_hash), _UINT32_MAX, dtype=jnp.uint32)
    if chunk is None:
        p = length - k + 1
        fit = (256 << 20) // max(p * n_hash * 4, 1)
        chunk = int(
            np.clip(1 << max(fit, 1).bit_length() - 1, 64, 131072)
        )
    seeds = jnp.asarray(hash_family_seeds(n_hash, seed))
    if n <= chunk:
        return _signatures_kernel(ascii_tokens, lengths, seeds, k=k)
    # Chunk on the HOST (numpy) and feed every chunk through the SAME
    # [chunk, L] program.  Device-side slicing (`arr[s:s+chunk]`) makes
    # one XLA slice program per distinct offset — ~32 compile RPCs under
    # the TPU relay for a 65k set, 156s cold vs 0.5s hot.  (lax.map over
    # a reshaped [n_chunks, chunk, L] is worse still: the relay takes
    # >15 min to compile the loop.)  Host transfers are trivial (bytes).
    ascii_np = np.asarray(ascii_tokens)
    len_np = np.asarray(lengths)
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        ascii_np = np.pad(ascii_np, ((0, n_pad - n), (0, 0)))
        len_np = np.pad(len_np, (0, n_pad - n))
    outs = [
        _signatures_kernel(
            jnp.asarray(ascii_np[s : s + chunk]),
            jnp.asarray(len_np[s : s + chunk]),
            seeds,
            k=k,
        )
        for s in range(0, n_pad, chunk)
    ]  # async dispatches of ONE compiled program
    # assemble on host: a device-side concatenate would compile one
    # program per distinct chunk COUNT (a new multi-minute relay RPC for
    # every new N); per-chunk fetches are cheap and pipeline behind the
    # dispatches above.  device_put of the result compiles nothing.
    return jnp.asarray(
        np.concatenate([np.asarray(o) for o in outs], axis=0)[:n]
    )


def _count_dtype(n_hash: int):
    # counts are <= n_hash; uint8 quarters the device->host transfer
    # (the [N, N] count matrix dominates bytes moved at large N)
    return jnp.uint8 if n_hash <= 255 else jnp.int32


@functools.partial(jax.jit, static_argnames=("block",))
def _agreement_kernel(
    sigs: jnp.ndarray, *, block: int = 256
) -> jnp.ndarray:
    """All-pairs signature agreement counts, blocked over rows.

    sigs: uint32 [N, H] with N padded to a multiple of ``block`` by the
    caller.  Returns [N, N] counts of agreeing slots (uint8 when they
    fit); XLA fuses the [block, N, H] compare with its reduction so it
    never materializes.
    """
    n, n_hash = sigs.shape
    dt = _count_dtype(n_hash)

    def row_block(i, acc):
        blk = jax.lax.dynamic_slice(sigs, (i * block, 0), (block, n_hash))
        eq = blk[:, None, :] == sigs[None, :, :]  # [block, N, H] (fused)
        counts = jnp.sum(eq, axis=-1, dtype=jnp.int32).astype(dt)
        return jax.lax.dynamic_update_slice(acc, counts, (i * block, 0))

    acc = jnp.zeros((n, n), dtype=dt)
    return jax.lax.fori_loop(0, n // block, row_block, acc)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def _fused_mh_kernel(
    ascii_tokens: jnp.ndarray,  # uint8 [N, L] (N padded to block)
    lengths: jnp.ndarray,  # int32 [N]
    seeds: jnp.ndarray,  # uint32 [H]
    row_valid: jnp.ndarray,  # bool [N] (False for padding rows)
    *,
    k: int,
    block: int,
) -> jnp.ndarray:
    """Signature build + all-pairs agreement in ONE dispatch.

    For small workloads the two-kernel path pays several host->device
    round trips (each an RPC under the TPU relay); fusing them keeps a
    641-probe quick-start call to a single execute + one fetch.  Padding
    rows get per-row distinct signatures so they never agree.
    """
    sigs = _signatures_kernel(ascii_tokens, lengths, seeds, k=k)
    n = sigs.shape[0]
    # make padding rows pairwise-distinct and distinct from real rows
    row_id = jnp.arange(n, dtype=jnp.uint32)[:, None] + jnp.uint32(1)
    sigs = jnp.where(row_valid[:, None], sigs, row_id)
    counts = _agreement_kernel(sigs, block=block)
    # n_hash <= 255 is already uint8; narrow int32 counts to int16
    # INSIDE the fused program (no extra dispatch; halves the fetch)
    if counts.dtype == jnp.int32 and seeds.shape[0] < 32768:
        counts = counts.astype(jnp.int16)
    return counts


def signature_agreement_counts(
    sigs: np.ndarray | jnp.ndarray, *, block: int = 256
) -> jnp.ndarray:
    """int32 [N, N] count of agreeing signature slots per pair."""
    sigs = jnp.asarray(sigs, dtype=jnp.uint32)
    n = sigs.shape[0]
    n_pad = -(-n // block) * block
    padded = sigs
    if n_pad != n:
        # pad rows with distinct per-row fill so padded rows never agree
        fill = (
            jnp.arange(n_pad - n, dtype=jnp.uint32)[:, None]
            + jnp.uint32(1)
        ) * jnp.ones((1, sigs.shape[1]), dtype=jnp.uint32)
        padded = jnp.concatenate([sigs, fill], axis=0)
    return _agreement_kernel(padded, block=block)[:n, :n]


def signature_similarity(
    sigs: np.ndarray | jnp.ndarray, *, block: int = 256
) -> np.ndarray:
    """Symmetric [N, N] float64 similarity = fraction of agreeing slots.

    matches/n_hash is divided in float64 on the host, matching the C++
    double division (src/minHash.cpp:174) bit-for-bit.  Diagonal is
    exactly 1.0 (reference sets it explicitly, src/minHash.cpp:161).
    """
    n_hash = np.asarray(sigs).shape[1]
    dev = signature_agreement_counts(sigs, block=block)
    # n_hash <= 255 already fetches uint8 (_count_dtype); for larger
    # n_hash the int32 counts narrow to int16 on device, halving the
    # dominant device->host fetch (value-exact; counts <= n_hash).
    # NEVER widen a uint8 result — that would double the fetch.
    if dev.dtype == jnp.int32 and n_hash < 32768:
        dev = dev.astype(jnp.int16)
    counts = np.asarray(dev).astype(np.float64)
    sims = counts / float(n_hash)
    np.fill_diagonal(sims, 1.0)
    return sims
