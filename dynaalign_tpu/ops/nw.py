"""Needleman–Wunsch / Gotoh percent-identity: batched wavefront DP in JAX.

Behavioural spec: reference src/pairwiseSeqAlign.cpp:209-313
(``calculate_similarity``).  The score is NOT the alignment score — it is
percent identity (matches / alignment_length) along the traceback path.

TPU-first design
----------------
The reference fills an (m+1)x(n+1) DP grid row-major and then walks an
explicit traceback matrix backwards.  Neither maps to XLA: the row-major
fill is serial in both axes, and a materialized traceback blows memory for
batched pairs.  Instead:

* **Anti-diagonal wavefront**: cell (i, j) depends on (i-1, j), (i, j-1)
  — previous diagonal — and (i-1, j-1) — two diagonals back.  A
  ``lax.scan`` over d = i+j sweeps the grid in M+N steps; every cell on a
  diagonal (lane axis) and every pair in the batch (sublane axis) updates
  in parallel on the VPU.

* **Traceback without a traceback matrix**: the reference's backward walk
  reads one traceback char per visited cell, and that char depends only on
  that cell's own (M, Ix, Iy) comparisons (priority D > U > L,
  src/pairwiseSeqAlign.cpp:271-279).  So the pair
  (matches, length) of the path from any cell back to the origin satisfies
  a *forward* recurrence over the same decisions — carrying two extra
  int32 planes through the scan reproduces the reference's greedy
  traceback bit-for-bit in O(diagonal) memory.

* **Quirk parity** (src/pairwiseSeqAlign.cpp:222-235 vs :255,:260): border
  gaps cost gapOpen + (len-1)*gapExt while interior gap openings cost
  gapOpen + gapExt; int32 arithmetic with the INT_MIN/2 sentinel is kept
  verbatim.

Each batch element is an independent pair, so the all-pairs driver
(`dynaalign_tpu.parallel.allpairs`) tiles the upper-triangular pair grid
into [TI x TJ] blocks and maps them across the device mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_SENTINEL = np.int32(np.iinfo(np.int32).min // 2)  # INT_MIN / 2


class NWResult(NamedTuple):
    matches: jnp.ndarray  # int32 [B]
    length: jnp.ndarray  # int32 [B]

    def similarity(self) -> np.ndarray:
        """matches / alignment_length in float64 (C++ double semantics)."""
        m = np.asarray(self.matches, dtype=np.float64)
        ln = np.asarray(self.length, dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            return m / ln


def _shift_down(x: jnp.ndarray, fill) -> jnp.ndarray:
    """out[..., i] = x[..., i-1]; out[..., 0] = fill."""
    pad = jnp.full_like(x[..., :1], fill)
    return jnp.concatenate([pad, x[..., :-1]], axis=-1)


@functools.partial(
    jax.jit, static_argnames=("gap_open", "gap_ext", "unroll")
)
def nw_similarity_batch(
    a_idx: jnp.ndarray,  # int32 [B, M] alphabet indices (PAD beyond len)
    a_len: jnp.ndarray,  # int32 [B]
    b_idx: jnp.ndarray,  # int32 [B, N]
    b_len: jnp.ndarray,  # int32 [B]
    sub: jnp.ndarray,  # int32 [32, 32] padded substitution matrix
    *,
    gap_open: int = 10,
    gap_ext: int = 4,
    unroll: int = 4,
) -> NWResult:
    """(matches, alignment_length) for a batch of sequence pairs.

    The returned ints divide to the reference's similarity exactly
    (validated against the C++ oracle in tests/test_nw.py).
    """
    bsz, m_max = a_idx.shape
    n_max = b_idx.shape[1]
    lanes = m_max + 1  # lane i <-> row index i of the DP grid
    go_ge = np.int32(gap_open + gap_ext)
    ge = np.int32(gap_ext)
    go = np.int32(gap_open)
    neg = NEG_SENTINEL

    a_len = a_len.astype(jnp.int32)
    b_len = b_len.astype(jnp.int32)

    # lane i holds a-char a[i-1]; lane 0 unused (border row)
    pad_col = jnp.full((bsz, 1), 31, dtype=jnp.int32)
    a_sh = jnp.concatenate([pad_col, a_idx.astype(jnp.int32)], axis=1)
    # substitution rows per lane, gathered once outside the scan: [B, L, 32]
    a_rows = jnp.take(sub.astype(jnp.int32), a_sh, axis=0)
    b_i32 = b_idx.astype(jnp.int32)

    lane = jnp.arange(lanes, dtype=jnp.int32)[None, :]  # [1, L]
    onehot_iota = jnp.arange(32, dtype=jnp.int32)[None, None, :]

    zeros = jnp.zeros((bsz, lanes), dtype=jnp.int32)
    negs = jnp.full((bsz, lanes), neg, dtype=jnp.int32)

    # diagonal d=0: only cell (0,0) is real: M=0, Ix=Iy=sentinel, path empty
    prev = dict(
        M=negs.at[:, 0].set(0), Ix=negs, Iy=negs, MT=zeros, LN=zeros
    )
    prev2 = dict(M=negs, Ix=negs, Iy=negs, MT=zeros, LN=zeros)
    w0 = jnp.full((bsz, lanes), 31, dtype=jnp.int32)
    cap = (jnp.zeros((bsz,), jnp.int32), jnp.zeros((bsz,), jnp.int32))
    final_d = a_len + b_len  # diagonal holding each pair's (m, n) cell

    def step(carry, d):
        prev, prev2, w, cap_mt, cap_ln = carry
        # b-char window: w[i] = b[d-1-i]  (shift down, insert b[d-1] at lane 0)
        bcol = jax.lax.dynamic_slice_in_dim(
            b_i32, jnp.clip(d - 1, 0, n_max - 1), 1, axis=1
        )[:, 0]
        w = _shift_down(w, 0)
        w = w.at[:, 0].set(bcol)

        up_M = _shift_down(prev["M"], neg)
        up_Ix = _shift_down(prev["Ix"], neg)
        up_MT = _shift_down(prev["MT"], 0)
        up_LN = _shift_down(prev["LN"], 0)
        di_M = _shift_down(prev2["M"], neg)
        di_Ix = _shift_down(prev2["Ix"], neg)
        di_Iy = _shift_down(prev2["Iy"], neg)
        di_MT = _shift_down(prev2["MT"], 0)
        di_LN = _shift_down(prev2["LN"], 0)

        # score[i] = sub[a[i-1], b[j-1]] via one-hot over the 32-wide row
        score = jnp.sum(
            a_rows * (w[:, :, None] == onehot_iota), axis=-1
        )

        ix = jnp.maximum(up_M - go_ge, up_Ix - ge)
        iy = jnp.maximum(prev["M"] - go_ge, prev["Iy"] - ge)
        mnew = jnp.maximum(di_M, jnp.maximum(di_Ix, di_Iy)) + score

        d_sel = (mnew >= ix) & (mnew >= iy)  # traceback priority D > U > L
        u_sel = jnp.logical_and(~d_sel, ix >= iy)
        m_cell = jnp.where(d_sel, mnew, jnp.where(u_sel, ix, iy))
        match = (a_sh == w).astype(jnp.int32)
        mt = jnp.where(
            d_sel, di_MT + match, jnp.where(u_sel, up_MT, prev["MT"])
        )
        ln = jnp.where(d_sel, di_LN, jnp.where(u_sel, up_LN, prev["LN"]))
        ln = ln + 1

        # borders: cell (0, d) at lane 0 ('L' column), cell (d, 0) at lane d
        border_gap = -go - (d - 1) * ge
        is_lane0 = lane == 0
        is_laned = lane == d
        m_cell = jnp.where(is_lane0 | is_laned, neg, m_cell)
        ix = jnp.where(
            is_laned, border_gap, jnp.where(is_lane0, neg, ix)
        )
        iy = jnp.where(
            is_lane0, border_gap, jnp.where(is_laned, neg, iy)
        )
        mt = jnp.where(is_lane0 | is_laned, 0, mt)
        ln = jnp.where(is_lane0 | is_laned, d, ln)

        # capture (matches, length) at each pair's final cell (m, n)
        hit = (d == final_d)[:, None] & (lane == a_len[:, None])
        cap_mt = cap_mt + jnp.sum(jnp.where(hit, mt, 0), axis=-1)
        cap_ln = cap_ln + jnp.sum(jnp.where(hit, ln, 0), axis=-1)

        new = dict(M=m_cell, Ix=ix, Iy=iy, MT=mt, LN=ln)
        return (new, prev, w, cap_mt, cap_ln), None

    ds = jnp.arange(1, m_max + n_max + 1, dtype=jnp.int32)
    (prev, prev2, w0, cap_mt, cap_ln), _ = jax.lax.scan(
        step, (prev, prev2, w0, *cap), ds, unroll=unroll
    )
    return NWResult(matches=cap_mt, length=cap_ln)


def nw_pairs(
    a_idx, a_len, b_idx, b_len, sub, **kw
) -> np.ndarray:
    """Convenience: similarity values (float64) for a batch of pairs."""
    res = nw_similarity_batch(
        jnp.asarray(a_idx), jnp.asarray(a_len), jnp.asarray(b_idx),
        jnp.asarray(b_len), jnp.asarray(sub), **kw,
    )
    return res.similarity()
