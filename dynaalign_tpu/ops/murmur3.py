"""Vectorized MurmurHash3-32 over k-mer windows, as uint32 lane ops.

The reference hashes every k-mer string through murmur3_32 one at a time
(src/minHash.cpp:21-64, called from the signature loop at :143-157).  On
TPU we instead treat the hash as pure uint32 vector arithmetic over a
``[N, P, H]`` tensor (sequences x k-mer positions x hash seeds): every
rotate/multiply/xor is a VPU op on 8x128 tiles, and the only "loop" is the
static unroll over the k bytes of the window — so one jitted kernel hashes
every k-mer of every sequence under every seed at once.

Bit-parity: the reference interprets k-mer bytes as little-endian 4-byte
blocks (x86 ``reinterpret_cast``); we assemble blocks explicitly from bytes
in little-endian order, so hashes match the C++ oracle exactly for any k.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy scalars, NOT jnp: creating device arrays at import time would
# initialise the XLA backend before jax.distributed.initialize() can run
# (parallel.distributed_init must be callable after `import dynaalign_tpu`)
_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_MIX1 = np.uint32(0x85EBCA6B)
_MIX2 = np.uint32(0xC2B2AE35)
_M5 = np.uint32(5)
_N = np.uint32(0xE6546B64)


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def murmur3_kmer_hashes(
    ascii_tokens: jnp.ndarray, k: int, seeds: jnp.ndarray
) -> jnp.ndarray:
    """Hash every length-k window of every sequence under every seed.

    Args:
      ascii_tokens: uint8 [N, L] raw character codes (padding arbitrary —
        callers mask invalid windows afterwards).
      k: static k-mer length (>= 1).
      seeds: uint32 [H] murmur seeds.

    Returns:
      uint32 [N, P, H] hashes, P = L - k + 1 window positions.
    """
    if k < 1:
        raise ValueError("'k' must be a positive integer")
    n, length = ascii_tokens.shape
    if length < k:
        raise ValueError(f"padded length {length} < k={k}")
    p = length - k + 1

    tok = ascii_tokens.astype(jnp.uint32)
    # byte o of each window: [N, P]
    byte = [tok[:, o : o + p] for o in range(k)]

    h = jnp.broadcast_to(
        seeds.astype(jnp.uint32)[None, None, :], (n, p, seeds.shape[0])
    )

    nblocks = k // 4
    for bi in range(nblocks):
        blk = (
            byte[4 * bi]
            | (byte[4 * bi + 1] << jnp.uint32(8))
            | (byte[4 * bi + 2] << jnp.uint32(16))
            | (byte[4 * bi + 3] << jnp.uint32(24))
        )
        kv = blk[:, :, None] * _C1
        kv = _rotl(kv, 15) * _C2
        h = h ^ kv
        h = _rotl(h, 13) * _M5 + _N

    rem = k & 3
    if rem:
        k1 = jnp.zeros((n, p), dtype=jnp.uint32)
        if rem == 3:
            k1 = k1 ^ (byte[4 * nblocks + 2] << jnp.uint32(16))
        if rem >= 2:
            k1 = k1 ^ (byte[4 * nblocks + 1] << jnp.uint32(8))
        k1 = k1 ^ byte[4 * nblocks]
        k1 = k1 * _C1
        k1 = _rotl(k1, 15) * _C2
        h = h ^ k1[:, :, None]

    h = h ^ jnp.uint32(k)
    h = h ^ (h >> jnp.uint32(16))
    h = h * _MIX1
    h = h ^ (h >> jnp.uint32(13))
    h = h * _MIX2
    h = h ^ (h >> jnp.uint32(16))
    return h
