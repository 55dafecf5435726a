"""Benchmark skew/transpose primitives for the NW score prepass.

The pad+reshape skew costs ~10 ms at B=256, m=n=639 (a per-row
byte-misaligned restagger of 210 MB).  Candidate replacements:
  E. Pallas strided-rotate skew (lane axis, stride over rows)
  F. Pallas strided-rotate skew (sublane axis) for the [Mp1, W, B] layout
  A/B/C. standalone XLA transposes (int8/bf16) to isolate their cost
Assembled pipelines are checked bit-exact vs _pack_score_diagonals.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dynaalign_tpu import blosum, encode
from dynaalign_tpu.io.datasets import load_sequences
from dynaalign_tpu.ops.nw_pallas import _pack_score_diagonals

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
    print(f"{label:46s} {per * 1e3:8.2f} ms/call", flush=True)
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
    w = n + mp1  # 1279

    def sync(x=None):
        if x is None:
            return
        np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:8])

    def packed_bmn(a_idx, b_idx):
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

    packed = jax.jit(packed_bmn)(a_idx, b_idx)  # [B, M, N] int8, on device
    ref_sd = jax.jit(_pack_score_diagonals)(a_idx, b_idx, sub)  # [W-1,B,Mp1]

    # ---- A/B: standalone XLA minor-axis transposes ----
    x_bmpw = jnp.pad(packed, ((0, 0), (1, 0), (0, w - n)))  # [B, Mp1, W]
    tr_a = jax.jit(lambda x: jnp.transpose(x, (2, 0, 1)))
    marginal(lambda: tr_a(x_bmpw), sync, "A. XLA transpose (2,0,1) int8 [B,Mp1,W]")
    x_bf16 = x_bmpw.astype(jnp.bfloat16)
    marginal(lambda: tr_a(x_bf16), sync, "B. XLA transpose (2,0,1) bf16 [B,Mp1,W]")
    tr_c = jax.jit(lambda x: jnp.transpose(x, (1, 2, 0)))
    marginal(lambda: tr_c(packed), sync, "C. XLA transpose (1,2,0) int8 [B,M,N]")

    # ---- E: Pallas strided-rotate skew, lane axis ----
    BC, RC = 8, 128

    def _skew_kernel_e(x_ref, o_ref):
        r0 = pl.program_id(1) * RC
        o_ref[:] = pltpu.roll(x_ref[:], r0, 2, stride=1, stride_axis=1)

    @jax.jit
    def skew_e(packed):
        x = jnp.pad(packed, ((0, 0), (1, 0), (0, w - n)))  # [B, Mp1, W]
        return pl.pallas_call(
            _skew_kernel_e,
            grid=(B // BC, mp1 // RC),
            in_specs=[pl.BlockSpec(
                (BC, RC, w), lambda b, r: (b, r, 0),
                memory_space=pltpu.VMEM,
            )],
            out_specs=pl.BlockSpec(
                (BC, RC, w), lambda b, r: (b, r, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, mp1, w), jnp.int8),
        )(x)

    try:
        ys = skew_e(packed)
        ok_e = bool(
            jnp.array_equal(jnp.transpose(ys[:, :, : w - 1], (2, 0, 1)), ref_sd)
        )
        print(f"E skew correct: {ok_e}", flush=True)
        marginal(lambda: skew_e(packed), sync, "E. Pallas strided-roll skew [B,Mp1,W]")
        # E2e pipeline P1: einsum + pallas skew + XLA transpose
        p1 = jax.jit(
            lambda a, b: jnp.transpose(
                skew_e(packed_bmn(a, b))[:, :, : w - 1], (2, 0, 1)
            )
        )
        ok_p1 = bool(jnp.array_equal(p1(a_idx, b_idx), ref_sd))
        print(f"P1 pipeline correct: {ok_p1}", flush=True)
        marginal(lambda: p1(a_idx, b_idx), sync, "P1. einsum+pallas-skew+transpose")
    except Exception as exc:
        print(f"E failed: {type(exc).__name__}: {str(exc)[:300]}")

    # ---- F: Pallas strided-rotate skew, sublane axis, [Mp1, W, B] ----
    MC = 8

    def _skew_kernel_f(x_ref, o_ref):
        r0 = pl.program_id(0) * MC
        o_ref[:] = pltpu.roll(x_ref[:], r0, 1, stride=1, stride_axis=0)

    @jax.jit
    def skew_f(packed_mnb):  # [M, N, B] int8
        x = jnp.pad(packed_mnb, ((1, 0), (0, w - n), (0, 0)))  # [Mp1, W, B]
        return pl.pallas_call(
            _skew_kernel_f,
            grid=(mp1 // MC,),
            in_specs=[pl.BlockSpec(
                (MC, w, B), lambda r: (r, 0, 0), memory_space=pltpu.VMEM,
            )],
            out_specs=pl.BlockSpec(
                (MC, w, B), lambda r: (r, 0, 0), memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((mp1, w, B), jnp.int8),
        )(x)

    try:
        packed_mnb = jnp.transpose(packed, (1, 2, 0))
        yf = skew_f(packed_mnb)
        # yf[i, d, b] should equal ref_sd[d, b, i] for d < w-1
        ok_f = bool(
            jnp.array_equal(
                jnp.transpose(yf[:, : w - 1, :], (1, 2, 0)),
                jnp.transpose(ref_sd, (0, 2, 1)),
            )
        )
        # ref for short layout is sd transposed (0,2,1): [D, Mp1, B]
        print(f"F skew correct: {ok_f}", flush=True)
        marginal(lambda: skew_f(packed_mnb), sync, "F. Pallas strided-roll skew [Mp1,W,B]")
        # P2: einsum bmn + minor transpose to mnb + skew_f + major transpose
        p2 = jax.jit(
            lambda a, b: jnp.transpose(
                skew_f(jnp.transpose(packed_bmn(a, b), (1, 2, 0)))[:, : w - 1],
                (1, 0, 2),
            )
        )
        ok_p2 = bool(
            jnp.array_equal(
                p2(a_idx, b_idx), jnp.transpose(ref_sd, (0, 2, 1))
            )
        )
        print(f"P2 pipeline correct: {ok_p2}", flush=True)
        marginal(lambda: p2(a_idx, b_idx), sync, "P2. einsum+transpose+skew_f+major-tr")
    except Exception as exc:
        print(f"F failed: {type(exc).__name__}: {str(exc)[:300]}")


if __name__ == "__main__":
    main()
