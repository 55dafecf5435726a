"""Pallas TPU kernel for the batched NW/Gotoh wavefront DP.

Same semantics as ops.nw (reference src/pairwiseSeqAlign.cpp:209-313,
bit-exact percent identity), engineered for the chip:

* **Score pre-pass on the MXU, zero gathers.**  Per-cell substitution
  scores never go through a table gather: the [B, M, N] score tensor is
  two one-hot matmuls (exact in bf16 — every product has a single
  non-zero term), the traceback match bit is packed into the same int8,
  and the tensor is *skewed into anti-diagonal-major layout with a pure
  pad+reshape+transpose*:  padding each row of an [M, W] array to width W
  and reslicing row-major at stride W-1 realigns column d of the result
  to anti-diagonal d (flat[i*(W-1)+d] = X[i, d-i]).  No gather ops
  anywhere on the hot path.

* **DP state lives in VMEM across the whole sweep.**  The kernel runs a
  1-D grid over anti-diagonals; Pallas pipelines one [B, Mp1] int8 score
  diagonal per step from HBM (double-buffered automatically) while the
  state planes stay resident in VMEM scratch — the lax.scan version pays
  tens of MB of HBM carry traffic per diagonal; this kernel pays 160 KB.

* **Packed traceback statistics.**  (matches, length) ride in one int32
  plane as (mt << 13) | ln — one select chain instead of two and 20%
  less VMEM traffic.  Valid while m + n < 8192.

* **Two-buffer parity rotation.**  prev/prev2 roles alternate between
  two fixed scratch sets by diagonal parity (pl.when), so no buffer
  copies and no dynamic scratch indexing.

Shapes: lanes = Mp1 (DP row index; pad M so Mp1 is a multiple of 128 for
full-lane tiles), sublanes = B (pair batch).  The per-pair result is
captured on the fly at each pair's final cell and written on the last
grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nw import NWResult

NEG = np.int32(np.iinfo(np.int32).min // 2)
_LN_BITS = 13
_LN_MASK = (1 << _LN_BITS) - 1


def _pack_score_diagonals(
    a_idx: jnp.ndarray,  # int32 [B, M]
    b_idx: jnp.ndarray,  # int32 [B, N]
    sub: jnp.ndarray,  # int32 [32, 32]
) -> jnp.ndarray:
    """int8 [D, B, Mp1] anti-diagonal-major packed (2*score + match).

    Lane i of diagonal-block d holds cell (i, j=d+1-i)'s substitution
    score and char-equality bit; out-of-grid lanes read zeros.
    """
    bsz, m = a_idx.shape
    n = b_idx.shape[1]
    mp1 = m + 1
    w = n + mp1  # padded row width for the skew

    oa = jax.nn.one_hot(a_idx, 32, dtype=jnp.bfloat16)  # [B, M, 32]
    ob = jax.nn.one_hot(b_idx, 32, dtype=jnp.bfloat16)  # [B, N, 32]
    rows = jnp.einsum(
        "bmk,kl->bml", oa, sub.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    scores = jnp.einsum(
        "bml,bnl->bmn", rows, ob, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    match = (a_idx[:, :, None] == b_idx[:, None, :]).astype(jnp.int32)
    packed = (scores * 2 + match).astype(jnp.int8)  # [B, M, N]

    # leading zero row (lane 0 = border row) + right-pad to width W
    x = jnp.pad(packed, ((0, 0), (1, 0), (0, w - n)))  # [B, Mp1, W]
    flat = x.reshape(bsz, mp1 * w)
    skew = flat[:, : mp1 * (w - 1)].reshape(bsz, mp1, w - 1)
    # skew[b, i, d] == x[b, i, d - i]  (zeros when d < i or d-i >= N)
    return jnp.transpose(skew, (2, 0, 1))  # [D = M+N, B, Mp1]


def _kernel(
    sd_ref,  # int8 [1, B, Mp1] — packed scores of this diagonal
    alen_ref,  # int32 [B, 1]
    fd_ref,  # int32 [B, 1] — final diagonal (m + n) per pair
    out_ref,  # int32 [B, 1] — packed (matches << 13 | length)
    # scratch: two parity sets of (M, Ix, Iy, MTLN) + capture accum
    m_a, ix_a, iy_a, s_a,
    m_b, ix_b, iy_b, s_b,
    cap,
    *,
    go: int,
    ge: int,
    bsz: int,
    mp1: int,
):
    g = pl.program_id(0)
    d1 = g + 1  # diagonal number being computed
    lane = jax.lax.broadcasted_iota(jnp.int32, (bsz, mp1), 1)

    @pl.when(g == 0)
    def _init():
        # prev (= diagonal 0): M=0 at lane 0, sentinels elsewhere
        m_b[:] = jnp.where(lane == 0, 0, NEG)
        ix_b[:] = jnp.full((bsz, mp1), NEG, jnp.int32)
        iy_b[:] = jnp.full((bsz, mp1), NEG, jnp.int32)
        s_b[:] = jnp.zeros((bsz, mp1), jnp.int32)
        # prev2 (= diagonal -1): never a real ancestor; sentinels
        m_a[:] = jnp.full((bsz, mp1), NEG, jnp.int32)
        ix_a[:] = jnp.full((bsz, mp1), NEG, jnp.int32)
        iy_a[:] = jnp.full((bsz, mp1), NEG, jnp.int32)
        s_a[:] = jnp.zeros((bsz, mp1), jnp.int32)
        cap[:] = jnp.zeros((bsz, 1), jnp.int32)

    packed = sd_ref[0].astype(jnp.int32)
    score = packed >> 1  # arithmetic shift == floor((2s+m)/2) == s
    match = packed & 1

    def body(prev, prev2_and_dst):
        """prev = (M, Ix, Iy, MTLN) refs of diagonal d1-1; prev2_and_dst =
        refs of diagonal d1-2, overwritten in place with diagonal d1."""
        pM, pIx, pIy, pS = prev
        qM, qIx, qIy, qS = prev2_and_dst

        def sh(ref):  # shifted[i] = ref[i-1] (lane 0 cyclic garbage,
            return pltpu.roll(ref[:], 1, 1)  # overwritten by borders)

        up_m, up_ix, up_s = sh(pM), sh(pIx), sh(pS)
        di_m, di_ix, di_iy, di_s = sh(qM), sh(qIx), sh(qIy), sh(qS)
        left_m, left_iy, left_s = pM[:], pIy[:], pS[:]

        ix = jnp.maximum(up_m - (go + ge), up_ix - ge)
        iy = jnp.maximum(left_m - (go + ge), left_iy - ge)
        mnew = jnp.maximum(di_m, jnp.maximum(di_ix, di_iy)) + score

        d_sel = (mnew >= ix) & (mnew >= iy)  # priority D > U > L
        u_sel = (~d_sel) & (ix >= iy)
        m_cell = jnp.where(d_sel, mnew, jnp.where(u_sel, ix, iy))
        s_cell = (
            jnp.where(
                d_sel,
                di_s + (match << _LN_BITS),
                jnp.where(u_sel, up_s, left_s),
            )
            + 1  # length += 1 on every move
        )

        border_gap = -go - (d1 - 1) * ge
        is0 = lane == 0
        isd = lane == d1
        m_cell = jnp.where(is0 | isd, NEG, m_cell)
        ix = jnp.where(isd, border_gap, jnp.where(is0, NEG, ix))
        iy = jnp.where(is0, border_gap, jnp.where(isd, NEG, iy))
        s_cell = jnp.where(is0 | isd, d1, s_cell)

        # capture each pair's final cell (m, n) when its diagonal arrives
        hit = (fd_ref[:] == d1) & (alen_ref[:] == lane)
        cap[:] += jnp.sum(jnp.where(hit, s_cell, 0), axis=1, keepdims=True)

        qM[:], qIx[:], qIy[:], qS[:] = m_cell, ix, iy, s_cell

    set_a = (m_a, ix_a, iy_a, s_a)
    set_b = (m_b, ix_b, iy_b, s_b)

    @pl.when(g % 2 == 0)
    def _even():  # prev in set_b, prev2/destination in set_a
        body(set_b, set_a)

    @pl.when(g % 2 == 1)
    def _odd():
        body(set_a, set_b)

    @pl.when(g == pl.num_programs(0) - 1)
    def _emit():
        out_ref[:] = cap[:]


@functools.partial(
    jax.jit,
    static_argnames=("gap_open", "gap_ext", "interpret"),
)
def nw_similarity_batch_pallas(
    a_idx: jnp.ndarray,  # int32 [B, M]
    a_len: jnp.ndarray,  # int32 [B]
    b_idx: jnp.ndarray,  # int32 [B, N]
    b_len: jnp.ndarray,  # int32 [B]
    sub: jnp.ndarray,  # int32 [32, 32]
    *,
    gap_open: int = 10,
    gap_ext: int = 4,
    interpret: bool = False,
) -> NWResult:
    """(matches, alignment_length) per pair — Pallas TPU fast path.

    Bit-identical to ops.nw.nw_similarity_batch (checked in
    tests/test_nw_pallas.py); use interpret=True off-TPU.
    """
    bsz, m = a_idx.shape
    n = b_idx.shape[1]
    if m + n >= (1 << _LN_BITS):
        raise ValueError(
            f"padded m+n = {m + n} exceeds packed-length budget "
            f"{(1 << _LN_BITS) - 1}; use ops.nw.nw_similarity_batch"
        )
    mp1 = m + 1
    d_total = m + n

    sd = _pack_score_diagonals(
        a_idx.astype(jnp.int32), b_idx.astype(jnp.int32), sub
    )
    alen = a_len.astype(jnp.int32).reshape(bsz, 1)
    fd = (a_len + b_len).astype(jnp.int32).reshape(bsz, 1)

    kernel = functools.partial(
        _kernel, go=gap_open, ge=gap_ext, bsz=bsz, mp1=mp1
    )
    state = lambda: pltpu.VMEM((bsz, mp1), jnp.int32)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(d_total,),
        in_specs=[
            pl.BlockSpec(
                (1, bsz, mp1), lambda g: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bsz, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, 1), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsz, 1), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1), jnp.int32),
        scratch_shapes=[state() for _ in range(8)]
        + [pltpu.VMEM((bsz, 1), jnp.int32)],
        interpret=interpret,
    )(sd, alen, fd)
    packed = out[:, 0]
    return NWResult(
        matches=packed >> _LN_BITS, length=packed & _LN_MASK
    )
