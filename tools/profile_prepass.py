"""Stage-by-stage cost of the NW score prepass on the real chip."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dynaalign_tpu import blosum, encode
from dynaalign_tpu.io.datasets import load_sequences

B = 256
PAD = 639
K1, K2 = 3, 9
REPS = 3


def _window(fn, sync, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn()
    sync(out)
    return time.perf_counter() - t0


def marginal(fn, sync, label):
    for _ in range(2):
        sync(fn())
    t_k1 = min(_window(fn, sync, K1) for _ in range(REPS))
    t_k2 = min(_window(fn, sync, K2) for _ in range(REPS))
    per = (t_k2 - t_k1) / (K2 - K1)
    print(f"{label:44s} {per * 1e3:8.2f} ms/call", flush=True)
    return per


def main():
    seqs = load_sequences("h3n2sample", limit=64)
    enc = encode.encode(seqs, pad_to=PAD)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    rng = np.random.default_rng(0)
    a_idx = jnp.asarray(enc.indices[rng.integers(0, enc.n, B)])
    b_idx = jnp.asarray(enc.indices[rng.integers(0, enc.n, B)])
    m = PAD
    n = PAD
    mp1 = m + 1
    w = n + mp1

    def sync(x=None):
        if x is None:
            return
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:8])

    def packed_bmn(a_idx, b_idx):
        oa = jax.nn.one_hot(a_idx, 32, dtype=jnp.bfloat16)
        ob = jax.nn.one_hot(b_idx, 32, dtype=jnp.bfloat16)
        rows = jnp.einsum(
            "bmk,kl->bml", oa, sub.astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16,
        )
        scores = jnp.einsum(
            "bml,bnl->bmn", rows, ob, preferred_element_type=jnp.float32
        ).astype(jnp.int32)
        match = (a_idx[:, :, None] == b_idx[:, None, :]).astype(jnp.int32)
        return (scores * 2 + match).astype(jnp.int8)

    def packed_bmn_bf16(a_idx, b_idx):
        # all-bf16: pack = 2*score + match computed in bf16 (exact, |v|<64)
        oa = jax.nn.one_hot(a_idx, 32, dtype=jnp.bfloat16)
        ob = jax.nn.one_hot(b_idx, 32, dtype=jnp.bfloat16)
        rows = jnp.einsum(
            "bmk,kl->bml", oa, (sub * 2).astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16,
        )
        scores = jnp.einsum(
            "bml,bnl->bmn", rows, ob, preferred_element_type=jnp.bfloat16
        )
        match = (a_idx[:, :, None] == b_idx[:, None, :]).astype(jnp.bfloat16)
        return (scores + match).astype(jnp.int8)

    def skew(packed):  # [B, M, N] -> [B, Mp1, W-1]
        x = jnp.pad(packed, ((0, 0), (1, 0), (0, w - n)))
        flat = x.reshape(B, mp1 * w)
        return flat[:, : mp1 * (w - 1)].reshape(B, mp1, w - 1)

    s1 = jax.jit(packed_bmn)
    s1b = jax.jit(packed_bmn_bf16)
    s2 = jax.jit(lambda a, b: skew(packed_bmn(a, b)))
    s2b = jax.jit(lambda a, b: skew(packed_bmn_bf16(a, b)))
    s3 = jax.jit(
        lambda a, b: jnp.transpose(skew(packed_bmn(a, b)), (2, 0, 1))
    )
    s3b = jax.jit(
        lambda a, b: jnp.transpose(skew(packed_bmn_bf16(a, b)), (2, 0, 1))
    )
    # chunked transpose: [B, Mp1, D] -> [B, Mp1, D/dc, dc] -> (2,0,1,3)
    dc = 128

    def chunked(a, b):
        sk = skew(packed_bmn_bf16(a, b))  # [B, Mp1, W-1]
        d = w - 1
        dpad = -(-d // dc) * dc
        sk = jnp.pad(sk, ((0, 0), (0, 0), (0, dpad - d)))
        return jnp.transpose(
            sk.reshape(B, mp1, dpad // dc, dc), (2, 0, 1, 3)
        )

    s4 = jax.jit(chunked)

    ok = bool(jnp.array_equal(s1(a_idx, b_idx), s1b(a_idx, b_idx)))
    print(f"bf16 pack bit-equal: {ok}", flush=True)

    marginal(lambda: s1(a_idx, b_idx), sync, "einsum+pack int8 [B,M,N] (f32 path)")
    marginal(lambda: s1b(a_idx, b_idx), sync, "einsum+pack int8 [B,M,N] (bf16 path)")
    marginal(lambda: s2(a_idx, b_idx), sync, "+ skew [B,Mp1,D] (f32)")
    marginal(lambda: s2b(a_idx, b_idx), sync, "+ skew [B,Mp1,D] (bf16)")
    marginal(lambda: s3(a_idx, b_idx), sync, "+ transpose (2,0,1) [D,B,Mp1] (f32)")
    marginal(lambda: s3b(a_idx, b_idx), sync, "+ transpose (2,0,1) [D,B,Mp1] (bf16)")
    marginal(lambda: s4(a_idx, b_idx), sync, "+ chunked transpose [D/dc,B,Mp1,dc]")


if __name__ == "__main__":
    main()
