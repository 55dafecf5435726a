"""Pallas TPU kernel for the batched NW/Gotoh wavefront DP.

Same semantics as ops.nw (reference src/pairwiseSeqAlign.cpp:209-313,
bit-exact percent identity), engineered for the chip:

* **Scores are generated inside the kernel — no HBM score tensor.**
  Rounds 1-2 materialized a packed [D, Mp1, B] anti-diagonal score
  tensor in HBM (~82 MB per 256-pair tile); its skew/pad cost 1.7x the
  DP kernel itself.  Now the prepass only builds a per-pair *substitution
  slab*: for every DP row i, the 24-entry BLOSUM row of that pair's
  a-character, bias-packed four bytes per int32 ([6, Mp1, B], ~3.5 MB,
  VMEM-resident for the whole sweep).  The kernel reconstructs each
  diagonal's scores on the fly: a `c`-plane (the b-character facing each
  DP row on the current anti-diagonal) advances by one sublane roll plus
  one streamed fresh row per diagonal, and the score byte is selected
  from the slab with a 5-select packed-word tree keyed by `c` plus a
  per-lane variable-shift byte extract.  ~17 extra VPU ops per cell in
  exchange for eliminating the 82 MB round trip and the skew entirely.

* **DP state lives in VMEM across the whole sweep.**  The kernel runs a
  1-D grid over anti-diagonals; only the [n_diag, B] fresh b-char rows
  stream from HBM per step (their offset is a pure function of the grid
  index, so the BlockSpec index map drives the DMA) while the state
  planes stay resident in VMEM scratch.

* **Packed traceback statistics.**  (matches, length) ride in one int32
  plane as (mt << ln_bits) | ln — one select chain instead of two and
  20% less VMEM traffic.  The length field is 13 bits below padded
  m + n = 8192 (byte-identical to rounds 1-4) and auto-widens to 15
  bits up to 32767 (matches <= min(m, n) < 16384 always fits the
  remaining bits), so multi-kilobase pairs stay on this kernel.

* **Two-buffer parity rotation, asymmetric state.**  prev/prev2 roles
  alternate between two fixed scratch sets (no buffer copies, no dynamic
  scratch indexing).  The d-2 ancestor is only ever consumed as
  ``max(M, Ix, Iy)[i-1][j-1]`` and ``S[i-1][j-1]`` (the reference
  overwrites M with that max in place, src/pairwiseSeqAlign.cpp:268-279,
  so interior best == stored M; at borders the max folds the border gap
  in), so the odd-diagonal set stores just (best, S) — 6 state planes
  instead of 8, and one lane-roll for the diagonal ancestor instead of
  three.

Shapes: lanes = B (pair batch; keep it a multiple of 128 for full-lane
vregs), sublanes = Mp1 (DP row index; pad M so Mp1 is a multiple of 8).
Pairs ride the lane axis for EVERY length regime.  The per-pair result
is captured on the fly at each pair's final cell and written on the last
grid step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nw import NWResult

NEG = np.int32(np.iinfo(np.int32).min // 2)
# int16 score planes use a shallower sentinel; eligibility is gated by
# nw_i16_ok's bound on the deepest legit DP value.  At common shapes
# the bounded garbage-cell decay provably fits int16 with no clamping
# (_i16_clamp_free); otherwise sentinel-lineage values are re-clamped
# to NEG16 every diagonal so the narrowing store never wraps.
NEG16 = np.int16(-26000)
_LN_BITS = 13
_LN_MASK = (1 << _LN_BITS) - 1
# wide packing for multi-kilobase pairs (round 5): with a 15-bit length
# field the packed stats serve padded m+n < 32768, and the matches
# field always fits — matches <= min(m, n) <= (m+n)/2 < 16384 needs 14
# bits, and 14 + 15 = 29 < 31.  The narrow 13-bit field stays the
# default below 8192 (byte-identical to rounds 1-4); past 2^15 the
# dispatcher falls back to the scan kernel.
_LN_BITS_WIDE = 15


def _ln_bits(d_total: int) -> int:
    """Packed-stats length-field width for padded m+n = d_total."""
    return _LN_BITS if d_total < (1 << _LN_BITS) else _LN_BITS_WIDE


# packed slab bytes store (2*sub + match) + _BIAS so every byte is
# unsigned; |2s+1| <= 66 across the six BLOSUM tables, so the biased
# byte is in [62, 195] and the extract is a shift+mask+subtract with no
# sign-extension dance
_BIAS = 128
# the 24-symbol alphabet packs into 6 words of 4 biased bytes each; the
# select tree over 6 words is 5 lane-selects (vs 7 for the 32-padded
# table) and the slab costs 24 bytes per (row, pair) cell instead of 32.
# c == PAD_ID (24) or a padded-bstream 0 selects a garbage word — those
# scores only ever reach cells outside every pair's valid region, which
# no valid cell reads (DP ancestors have strictly smaller indices).
_N_WORDS = 6


# sublane alignment of the dynamic band-window offset.  16 satisfies
# every plane's tile: (16, 128) for the int16 score planes, (8, 128)
# for the int32 stat/c planes and the slab.  (Round 3 used 32 — the
# int8 tile — but no int8 plane exists; 16 halves the alignment waste.)
_ALIGN = 16


def _diags_per_step() -> int:
    """Anti-diagonals processed per grid step (even; probe-tunable).

    Must divide _ALIGN when band limiting is on (the band window offset
    is _ALIGN-aligned and the streamed fresh-row block index must stay
    whole).

    NOTE on the env knobs (DYNAALIGN_NW_DIAGS / _BAND / _BAND_CLASSES /
    _I16): they are read at TRACE time and are not part of the jit
    cache key, so flipping one mid-process keeps serving the previously
    compiled configuration.  Unlike the old DYNAALIGN_NW_DEBUG (now an
    explicit argument), every value of these knobs is bit-exact — a
    stale read can only affect throughput, never results — so the
    one-process-per-configuration rule in tools/probe_kernel.py is a
    measurement discipline, not a correctness requirement.
    """
    return int(os.environ.get("DYNAALIGN_NW_DIAGS", "2"))


def nw_i16_ok(m: int, n: int, gap_open: int, gap_ext: int, sub) -> bool:
    """True when int16 score planes are provably bit-exact for this config.

    i16 is storage-only: scratch planes are stored int16 (halving the
    dominant VMEM scratch traffic) while all ALU ops, compares and
    lane-rolls run at int32 — loads widen, stores narrow — so none of
    the v5e Mosaic 16-bit vector-op restrictions apply.  Qualified
    bit-exact on the real v5e chip (tools/probe_i16.py, round 2) and on
    by default wherever the provable-overflow bound below holds; set
    DYNAALIGN_NW_I16=0 to force the int32 planes.

    Any legit DP value is a sum over at most m+n moves, each costing at
    least -(gap_open+gap_ext) (a gap open; extends cost less) or at
    least -max|sub| (a substitution), plus one border open — so its
    magnitude is bounded by (m+n)*worst_step + gap_open.  The clamped
    sentinel must stay strictly below every legit value even after one
    +score step, and the largest legit value (all-match path) must fit
    int16.
    """
    import os

    if os.environ.get("DYNAALIGN_NW_I16", "1") == "0":
        return False
    sub = np.asarray(sub)
    smax = int(np.max(np.abs(sub)))
    worst_step = max(gap_open + gap_ext, smax)
    deepest = (m + n) * worst_step + gap_open
    highest = smax * min(m, n) + smax
    return (
        deepest + smax + 64 < -int(NEG16)
        and highest < 32767
        and -int(NEG16) + gap_open + gap_ext + smax < 32768
    )


# Mosaic's scoped-VMEM stack for the long kernel measures ~85.5 bytes
# per (mp1, B) cell (state planes + slab + temporaries; linear in both:
# 24.85M at 568x512, 19.31M at 888x256) against a 16 MB limit.  Batches
# whose mp1 * B product exceeds this budget are split along the tile
# axis before launch (see _batch_split) so longer sequences (e.g. the
# ~880 aa tail of the full h3n2 set) stay on the Pallas path instead of
# failing to compile.  Round 5: the r5 step body carries one extra
# int32 scratch plane (Ssh), so the budget is scaled down ~5% from the
# round-4 180k to keep the same headroom.
_LONG_CELL_BUDGET = 171_000


def _batch_split(mp1: int, bsz: int, i16: bool = True) -> int:
    """Smallest power-of-two factor f such that (bsz/f) * mp1 fits the
    scoped VMEM budget (halving stops at odd or single-pair batches).
    The resulting bsz/f may drop below 128 lanes for very long
    sequences (e.g. 64 lanes at mp1=1536) — underutilized lanes beat
    no kernel at all.  Non-i16 configs (multi-kilobase pairs, where
    nw_i16_ok's overflow bound fails) store the four score planes at
    int32, ~16% more scratch bytes/cell — the budget scales down
    accordingly."""
    budget = _LONG_CELL_BUDGET if i16 else int(_LONG_CELL_BUDGET * 0.84)
    f = 1
    while bsz // f > 1 and (bsz // f) * mp1 > budget:
        if (bsz // f) % 2:
            break
        f *= 2
    return f


def _i16_clamp_free(mp1: int, gap_open: int, gap_ext: int) -> bool:
    """True when the int16 path can skip the per-diagonal sentinel
    re-clamps entirely (3 vector maxes per cell saved).

    Two facts make the clamps redundant at common shapes:

    1. **Valid cells never read unmasked garbage.**  A valid interior
       cell's ancestors are (i-1, j), (i, j-1), (i-1, j-1); cells with
       i == 0 or j == 0 are re-masked to fresh border/sentinel values on
       their own diagonal, so sentinel *lineage* decay only accumulates
       in cells outside every pair's valid region — whose values are
       never read by any valid cell and never captured.
    2. **Garbage decay is bounded by window residency.**  A row computed
       while above the band holds init sentinels and decays by at most
       gap_ext per diagonal (the cheapest surviving path is a pure gap
       extension) for at most ~mp1 diagonals before its border diagonal
       re-masks it; below-band rows start from legit-bounded values and
       leave the window within ~2*_ALIGN diagonals.  So every stored
       value stays above NEG16 - gap_ext*(mp1+2) - gap_open - margin,
       and the narrowing int16 store never wraps.

    When this bound does not fit int16 (very long sequences at large
    gap_ext), the clamps stay on — results are identical either way;
    only garbage-cell arithmetic differs.  The r5 step body stores the
    gap competitors R/Q (up to gap_open + 2*gap_ext below the old M/Ix
    values); the extra 3*(gap_open + gap_ext) term covers that offset
    for either variant.
    """
    return (
        -int(NEG16)
        + gap_ext * (mp1 + 4)
        + 3 * (gap_open + gap_ext)
        + 70
        < 32768
    )


def _score_slab(
    a_idx: jnp.ndarray,  # int32 [B, M]
    b_idx: jnp.ndarray,  # int32 [B, N]
    sub: jnp.ndarray,  # int32 [32, 32] (24x24 table, zero-padded)
    d_pad: int,  # padded diagonal count (multiple of n_diag)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Kernel-side scoring inputs: (slab [6, Mp1, B], bstream [Dpad, B]).

    slab[k, i, b] packs the four biased score bytes
    ``2*sub[a[b, i-1], l] + (a[b, i-1] == l) + 128`` for alphabet codes
    l = 4k..4k+3 into one int32 — the full 24-entry substitution row of
    pair b's i-th a-character, MXU-generated via a one-hot matmul (exact
    in bf16: each product has a single non-zero term and |2s+1| <= 66).
    Row 0 (the DP border row) is irrelevant (always masked) and holds
    bias bytes; PAD_ID a-characters one-hot to zero rows (bias bytes).

    bstream[d, b] is pair b's b-character at position d (int32, 0 beyond
    the padded length — those values only ever reach out-of-grid cells).
    The kernel's c-plane consumes row d-1-o(g) at diagonal d, so the
    rows double as the per-step DMA blocks.
    """
    bsz, m = a_idx.shape
    mp1 = m + 1
    nsym = 4 * _N_WORDS  # 24-symbol alphabet
    oa = jax.nn.one_hot(a_idx, nsym, dtype=jnp.bfloat16)  # [B, M, 24]
    sub2 = (
        2 * sub[:nsym, :nsym] + jnp.eye(nsym, dtype=sub.dtype)
    ).astype(jnp.bfloat16)
    rows = jnp.einsum(
        "bmk,kl->mlb", oa, sub2, preferred_element_type=jnp.bfloat16
    ).astype(jnp.int32) + _BIAS  # [M, 24, B] biased bytes
    rows = jnp.pad(rows, ((1, 0), (0, 0), (0, 0)),
                   constant_values=_BIAS)  # border row 0
    r4 = rows.reshape(mp1, _N_WORDS, 4, bsz)
    slab = (
        r4[:, :, 0]
        | (r4[:, :, 1] << 8)
        | (r4[:, :, 2] << 16)
        | (r4[:, :, 3] << 24)
    )  # [Mp1, 6, B]
    slab = jnp.transpose(slab, (1, 0, 2))  # [6, Mp1, B]
    bstream = jnp.pad(
        jnp.transpose(b_idx, (1, 0)),  # [N, B]
        ((0, d_pad - b_idx.shape[1]), (0, 0)),
    )
    return slab, bstream


def _band_select(g, nd, mp1, n_cols, band_classes):
    """(cls, o) band window choice for grid step g.

    Shared by the kernel body and the bstream BlockSpec index map — the
    streamed fresh-row offset must agree exactly with the in-kernel
    window offset.  Returns the class id and the _ALIGN-aligned sublane
    window offset; o == 0 when band_classes is empty.
    """
    if not band_classes:
        return jnp.int32(0), jnp.int32(0)
    d_first = nd * g + 1
    d_last = nd * g + nd
    lo = jnp.maximum(0, d_first - n_cols - 1)
    hi = jnp.minimum(d_last, mp1 - 1)
    lo_al = (lo // _ALIGN) * _ALIGN
    needed = hi - lo_al + 1
    cls = jnp.int32(0)
    for wc in band_classes[:-1]:
        cls = cls + (needed > wc).astype(jnp.int32)
    o = jnp.int32(0)
    for ci, wc in enumerate(band_classes):
        oc = jnp.minimum(lo // _ALIGN, (mp1 - wc) // _ALIGN) * _ALIGN
        o = jnp.where(cls == ci, oc, o)
    return cls, o


def _kernel(
    slab_ref,  # int32 [1, 6, Mp1, B] — packed substitution rows (VMEM)
    bstr_ref,  # int32 [1, 1, n_diag, B] — this step's fresh b-char rows
    alen_ref,  # int32 [1, B]
    fd_ref,  # int32 [1, B] — final diagonal (m + n) per pair
    out_ref,  # int32 [1, B] — packed (matches << 13 | length)
    # scratch planes (variant-dependent; see _run_kernel), then the
    # c-plane and the capture accumulator
    *scratch,
    go: int,
    ge: int,
    shape: tuple,  # (Mp1, B): DP rows on sublanes, pairs on lanes
    i16: bool = False,
    i16_clamp: bool = True,
    n_diag: int = 2,
    n_cols: int = 0,  # padded b-side length N (for the band window)
    band_classes: tuple = (),
    variant: str = "r5",
    ln_bits: int = _LN_BITS,
    debug: str = "",  # measurement-only stage ablation (WRONG results)
):
    """``n_diag`` anti-diagonals per grid step.

    **Two step-body variants** (identical results, fuzzed vs the oracle
    for both — tests/test_nw_pallas.py):

    * ``r4``: state per diagonal = (M, Ix, Iy, S) even / (best, S) odd.
      Six sublane rolls per diagonal (sh(M), sh(Ix), sh(best), sh(S)
      twice, c-plane) — the round-4 ablation prices a roll at ~3.5
      vector-op equivalents, making rolls ~40% of the runtime.
    * ``r5`` (default): the gap recurrences are evaluated at
      *production*: each diagonal stores Rsh = sh(max(M - go - ge,
      Ix - ge)) (pre-rolled) and Q = max(M - go - ge, Iy - ge), so the
      consumer's ix/iy are plain loads; and sh(S) is rolled ONCE and
      reused by both its d+1 (U-case) and d+2 (D-case) consumers.
      Four rolls per diagonal (Rsh, Ssh, bestsh, c-plane) at the cost
      of one extra int32 scratch plane (Ssh) and one extra load+store
      per step.  A true skewed storage layout was analysed and rejected:
      the diagonal recurrence needs both aligned and shifted reads of
      the same planes, so skew only swaps which operand set rolls (6
      either way) while making the score-slab row access dynamic; and
      Mosaic rejects misaligned dynamic sublane offsets outright
      ("cannot statically prove index is a multiple of 8",
      tools/probe_misalign.py), so shifted *loads* cannot replace rolls.

    With an even number of diagonals per step the parity mapping is
    fixed — set_b always holds the latest even diagonal, set_a the
    latest odd — so the body is straight-line (no parity branches);
    intermediate diagonals chain value-to-value without touching
    scratch, so per-diagonal scratch traffic and per-step grid overhead
    both scale down with n_diag.  D_total must be a multiple of n_diag.

    State planes are [Mp1, B]: pairs ride the 128-lane axis, DP rows the
    sublane axis.

    **In-kernel scoring.**  The c-plane scratch holds, for each DP row i
    in the active window, the b-character this diagonal pairs it with:
    c[i] = b[d-1-i].  Advancing one diagonal is a sublane roll by one
    (row i inherits row i-1's character) plus a fresh character at the
    window's top row (streamed via bstr_ref — its block offset
    d-1-o(g) is a pure function of the grid step, computed by the
    BlockSpec index map with the shared _band_select helper).  The score
    byte is then selected from the VMEM-resident slab with a 5-select
    where-tree over the 6 packed words keyed by c's high bits, and a
    per-lane variable shift extracts the biased byte.  Rows whose c was
    never initialised (window growth) only ever cover masked border or
    out-of-grid cells — see the band-correctness argument below.

    **Band limiting** (``band_classes`` non-empty): diagonal d only has
    valid DP rows i in [max(0, d-N), min(d, M)] — on average ~50% of the
    plane is dead work.  Each step computes only a sublane window
    [o, o+W) where W is the smallest static width class covering the
    step's band (reads also need row lo-1 for the ancestor shift) and o
    is the band start aligned down to _ALIGN (16: the finest alignment
    every plane's memory tile admits).  Correctness does not depend
    on the window: rows above the band keep their init values until
    their first border diagonal masks all state anyway, rows below the
    band are never read again (the band only ascends), and the roll
    wraparound garbage at window row 0 lands strictly below the write
    band.  The c-plane obeys the same induction: a row is covered by the
    window from its border diagonal (d == i) onward, so the roll chain
    that feeds it is unbroken from the fresh insert at the window top.
    Each class duplicates the step body under ``pl.when`` — compile time
    scales with len(band_classes).

    The grid is (T, D/n_diag): axis 0 sweeps independent pair tiles
    within ONE kernel launch (the TPU grid runs sequentially, so scratch
    is re-initialised per tile at g == 0 and the per-tile result emitted
    at the last diagonal step), amortising per-launch dispatch cost
    across the whole tile sweep.
    """
    g = pl.program_id(1)
    mp1, bsz = shape
    full_lane = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cap_shape = (1, bsz)
    if variant == "r5":
        rsh_b, q_b, s_b, ssh_b, bsh_b, bsh_a, ssh_a, c_pl, cap = scratch
    else:
        best_a, s_a, m_b, ix_b, iy_b, s_b, c_pl, cap = scratch
    # i16 is a STORAGE optimization only: the four score planes live in
    # VMEM as int16 (halving the dominant scratch read/write traffic),
    # but every ALU op, compare, and lane-roll runs at int32 — loads
    # widen, stores narrow.  This sidesteps the v5e Mosaic restrictions
    # on 16-bit vector compares/rotates that blocked the old 16-bit
    # compute path.  Sentinel lineage is re-clamped to NEG16 so the
    # narrowing store never wraps (legit values never reach NEG16 by
    # the nw_i16_ok bound).
    sdt = jnp.int16 if i16 else jnp.int32
    neg = jnp.int32(NEG16) if i16 else NEG

    def sh(x):  # shifted[i] = x[i-1] (row 0 cyclic garbage, masked later)
        return pltpu.roll(x, 1, 0)

    @pl.when(g == 0)
    def _init():
        # diagonal 0: M=0 at lane 0, sentinels elsewhere; Ix/Iy sentinel
        m0 = jnp.where(full_lane == 0, 0, neg)
        if variant == "r5":
            # derive the carried competitor planes from the same init
            # state through the production formulas (ix0=iy0=neg, so
            # both competitors collapse to max(M - go - ge, neg))
            g0 = jnp.maximum(m0 - (go + ge), neg)
            rsh_b[:] = sh(g0).astype(sdt)
            q_b[:] = g0.astype(sdt)
            s_b[:] = jnp.zeros(shape, jnp.int32)
            ssh_b[:] = jnp.zeros(shape, jnp.int32)
            bsh_b[:] = sh(m0).astype(sdt)  # best0 = max(M,Ix,Iy)0 = M0
            # odd set (= diagonal -1): never a real ancestor; sentinels
            bsh_a[:] = jnp.full(shape, neg, sdt)
            ssh_a[:] = jnp.zeros(shape, jnp.int32)
        else:
            m_b[:] = m0.astype(sdt)
            ix_b[:] = jnp.full(shape, neg, sdt)
            iy_b[:] = jnp.full(shape, neg, sdt)
            s_b[:] = jnp.zeros(shape, jnp.int32)
            # odd set (= diagonal -1): never a real ancestor; sentinels
            best_a[:] = jnp.full(shape, neg, sdt)
            s_a[:] = jnp.zeros(shape, jnp.int32)
        c_pl[:] = jnp.zeros(shape, jnp.int32)
        cap[:] = jnp.zeros(cap_shape, jnp.int32)

    def step_window(o, width):
        """Run this step's n_diag diagonals on sublane window [o, o+W)."""
        lane = o + jax.lax.broadcasted_iota(jnp.int32, (width, bsz), 0)
        local0 = jax.lax.broadcasted_iota(
            jnp.int32, (width, bsz), 0
        ) == 0
        win = (pl.ds(o, width), slice(None))
        # the 6 packed substitution words for the window's a-characters,
        # loaded once per step and shared by all n_diag diagonals
        sw = [slab_ref[0, k, win[0], :] for k in range(_N_WORDS)]

        def score_diag(c):
            """Per-cell (score, match) from the slab keyed by c.

            5-select binary tree over the 6 packed words (word index
            k = c >> 2 in [0, 5], keyed by c's bits 2/3/4); the
            impossible k in {6, 7} (only PAD_ID / padded-bstream
            garbage maps there) falls through to a harmless wrong word
            — see the _N_WORDS note for why those cells never matter.
            """
            sha = (c & 3) << 3
            b2 = (c & 4) != 0
            b3 = (c & 8) != 0
            b4 = (c & 16) != 0
            t0 = jnp.where(b2, sw[1], sw[0])
            t1 = jnp.where(b2, sw[3], sw[2])
            t2 = jnp.where(b2, sw[5], sw[4])
            u0 = jnp.where(b3, t1, t0)
            v = jnp.where(b4, t2, u0)
            s2 = ((v >> sha) & 0xFF) - _BIAS  # 2*score + match
            return s2 >> 1, s2 & 1

        def cell(d1, score, match, prev, prev2):
            """One diagonal's update.

            prev = (M, Ix, Iy, S) of diagonal d1-1; prev2 = (best, S) of
            d1-2, where best = max(M, Ix, Iy) — exactly the value the
            reference leaves in M at interior cells (the in-place
            overwrite at src/pairwiseSeqAlign.cpp:268-279) and the max
            the interior recurrence reads across the borders.
            """
            pM, pIx, pIy, pS = prev
            qBest, qS = prev2

            ix = jnp.maximum(sh(pM) - (go + ge), sh(pIx) - ge)
            iy = jnp.maximum(pM - (go + ge), pIy - ge)
            mnew = sh(qBest) + score
            if i16 and i16_clamp:
                # re-clamp sentinel lineage: the narrowing int16 store
                # would wrap under the per-diagonal gap decay; legit
                # values never reach NEG16 (nw_i16_ok gate), so clamping
                # only touches sentinels.  Skipped when _i16_clamp_free
                # proves the bounded decay fits int16 (the common case).
                ix = jnp.maximum(ix, neg)
                iy = jnp.maximum(iy, neg)
                mnew = jnp.maximum(mnew, neg)

            mxy = jnp.maximum(ix, iy)
            d_sel = mnew >= mxy  # priority D > U > L
            u_sel = (~d_sel) & (ix >= iy)
            m_cell = jnp.maximum(mnew, mxy)  # == the D/U/L-selected value
            if debug == "nostat":
                s_cell = pS  # ablate the packed-stats chain (2 rolls +
                # 2 selects + 2 adds) to measure its share
            else:
                s_cell = (
                    jnp.where(
                        d_sel,
                        sh(qS) + (match << ln_bits),
                        jnp.where(u_sel, sh(pS), pS),
                    )
                    + 1  # length += 1 on every move
                )

            border_gap = -go - (d1 - 1) * ge
            is0 = lane == 0
            isd = lane == d1
            m_cell = jnp.where(is0 | isd, neg, m_cell)
            ix = jnp.where(isd, border_gap, jnp.where(is0, neg, ix))
            iy = jnp.where(is0, border_gap, jnp.where(isd, neg, iy))
            s_cell = jnp.where(is0 | isd, d1, s_cell)
            # interior: m_cell is already max(mnew, ix, iy); at borders
            # the two extra maxes fold border_gap in — this is all
            # diagonal d1's successors two steps ahead ever read
            best = jnp.maximum(m_cell, jnp.maximum(ix, iy))

            # capture each pair's final cell (m, n) when its diagonal
            # arrives; guard the select+reduce behind a cheap any()
            row_hit = fd_ref[0] == d1

            @pl.when(jnp.any(row_hit))
            def _():
                hit = row_hit & (alen_ref[0] == lane)
                cap[:] += jnp.sum(
                    jnp.where(hit, s_cell, 0), axis=0, keepdims=True
                )

            return m_cell, ix, iy, s_cell, best

        def cell_r5(d1, score, match, prev, prev2):
            """Diagonal update with production-evaluated gap competitors.

            prev = (Rsh, Q, S, Ssh) of d1-1 where Rsh = sh(max(M - go -
            ge, Ix - ge)) and Q = max(M - go - ge, Iy - ge) — the gap
            recurrences were evaluated by the producing diagonal, so ix
            and iy here are plain (masked) reads.  prev2 = (sh(best),
            sh(S)) of d1-2; the sh(S) roll is produced ONCE per
            diagonal and consumed at both d1+1 (U case) and d1+2 (D
            case).  Interior selection/masking order is equivalent to
            cell() (masks are identity at interior cells; border cells'
            selections are overridden).
            """
            pRsh, pQ, pS, pSsh = prev
            qBsh, qSsh = prev2
            border_gap = -go - (d1 - 1) * ge
            is0 = lane == 0
            isd = lane == d1
            ix = jnp.where(isd, border_gap, jnp.where(is0, neg, pRsh))
            iy = jnp.where(is0, border_gap, jnp.where(isd, neg, pQ))
            mnew = qBsh + score
            if i16 and i16_clamp:
                mnew = jnp.maximum(mnew, neg)
            mxy = jnp.maximum(ix, iy)
            d_sel = mnew >= mxy  # priority D > U > L
            m_cell = jnp.where(
                is0 | isd, neg, jnp.maximum(mnew, mxy)
            )
            if debug == "nostat":
                s_cell = pS
            else:
                # the inner select only matters when d_sel is false, so
                # its condition is plain ix >= iy (no ~d_sel & needed)
                s_cell = (
                    jnp.where(
                        d_sel,
                        qSsh + (match << ln_bits),
                        jnp.where(ix >= iy, pSsh, pS),
                    )
                    + 1
                )
            s_cell = jnp.where(is0 | isd, d1, s_cell)
            # interior best == m_cell; at borders the max folds the
            # border gap in — all that d1's successors ever read
            best = jnp.maximum(m_cell, mxy)
            mg = m_cell - (go + ge)
            r = jnp.maximum(mg, ix - ge)
            q = jnp.maximum(mg, iy - ge)
            if i16 and i16_clamp:
                r = jnp.maximum(r, neg)
                q = jnp.maximum(q, neg)

            if debug != "nocap":
                row_hit = fd_ref[0] == d1

                def _capture():
                    hit = row_hit & (alen_ref[0] == lane)
                    cap[:] += jnp.sum(
                        jnp.where(hit, s_cell, 0), axis=0,
                        keepdims=True,
                    )

                if debug == "uncap":
                    # probe variant (CORRECT results): run the capture
                    # select+reduce every diagonal instead of guarding
                    # behind jnp.any
                    _capture()
                else:
                    pl.when(jnp.any(row_hit))(_capture)

            return sh(r), q, s_cell, sh(s_cell), sh(best)

        def advance_score(c_cur, t):
            if debug == "noscore":
                # ablate the whole scoring block (c-plane roll+insert,
                # 5-select tree, byte extract) to measure its share
                return c_cur, jnp.int32(1), jnp.int32(1)
            # advance the c-plane: row i inherits row i-1's b-char;
            # the window-top row takes this step's streamed char
            c_new = jnp.where(local0, bstr_ref[0, 0, t, :], sh(c_cur))
            score, match = score_diag(c_new)
            return c_new, score, match

        d0 = n_diag * g
        c_cur = c_pl[win]
        if variant == "r5":
            # chain n_diag diagonals value-to-value.  prev = (Rsh, Q,
            # S, Ssh) of the latest diagonal; prev2 = (bestsh, Ssh) of
            # the one before; pending = the latest diagonal's (bestsh,
            # Ssh), consumed as prev2 one diagonal later.
            prev = (
                rsh_b[win].astype(jnp.int32),
                q_b[win].astype(jnp.int32),
                s_b[win],
                ssh_b[win],
            )
            prev2 = (bsh_a[win].astype(jnp.int32), ssh_a[win])
            pending = (bsh_b[win].astype(jnp.int32), prev[3])
            for t in range(n_diag):
                c_cur, score, match = advance_score(c_cur, t)
                new = cell_r5(d0 + t + 1, score, match, prev, prev2)
                prev2 = pending
                pending = (new[4], new[3])
                prev = new[:4]
            c_pl[win] = c_cur
            rsh_b[win] = prev[0].astype(sdt)
            q_b[win] = prev[1].astype(sdt)
            s_b[win] = prev[2]
            ssh_b[win] = prev[3]
            bsh_b[win] = pending[0].astype(sdt)
            bsh_a[win] = prev2[0].astype(sdt)
            ssh_a[win] = prev2[1]
            return

        # r4 variant: loads widen int16-stored planes to the int32
        # compute width; only the final even diagonal's full state and
        # the final odd (best, S) touch scratch.  prev = latest
        # computed diagonal (d0 + t); prev2 = (best, S) of d0 + t - 1;
        # prev_best = max(M, Ix, Iy) of prev (two maxes over values
        # already live — never stored)
        bm = m_b[win].astype(jnp.int32)
        bix = ix_b[win].astype(jnp.int32)
        biy = iy_b[win].astype(jnp.int32)
        prev = (bm, bix, biy, s_b[win])
        prev2 = (best_a[win].astype(jnp.int32), s_a[win])
        prev_best = jnp.maximum(bm, jnp.maximum(bix, biy))
        for t in range(n_diag):
            c_cur, score, match = advance_score(c_cur, t)
            new = cell(d0 + t + 1, score, match, prev, prev2)
            prev2 = (prev_best, prev[3])
            prev = new[:4]
            prev_best = new[4]
        c_pl[win] = c_cur
        best_a[win] = prev2[0].astype(sdt)
        s_a[win] = prev2[1]
        m_b[win] = prev[0].astype(sdt)
        ix_b[win] = prev[1].astype(sdt)
        iy_b[win] = prev[2].astype(sdt)
        s_b[win] = prev[3]

    if band_classes:
        cls, _ = _band_select(g, n_diag, mp1, n_cols, band_classes)
        d_first = n_diag * g + 1
        lo = jnp.maximum(0, d_first - n_cols - 1)
        # NOTE (probed dead end, round 4): specializing a second
        # borderless body per class (borders=False once o > 0 and
        # d_first >= mp1 — provably no is0/isd hit) is bit-exact but
        # 7x SLOWER on chip (18.4 ms vs 2.5 ms/call): doubling the
        # pl.when bodies per step wrecks Mosaic's schedule far more
        # than the 11 saved ops help.  One body per class stays.
        for ci, wc in enumerate(band_classes):
            @pl.when(cls == ci)
            def _(wc=wc):
                # mp1 - wc is _ALIGN-aligned by construction of the
                # classes; keep `* _ALIGN` as the LAST op so Mosaic
                # can statically prove the offset's tile alignment
                o = (
                    jnp.minimum(lo // _ALIGN, (mp1 - wc) // _ALIGN)
                    * _ALIGN
                )
                step_window(o, wc)
    else:
        step_window(0, mp1)

    @pl.when(g == pl.num_programs(1) - 1)
    def _emit():
        out_ref[0] = cap[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "gap_open", "gap_ext", "interpret", "score_i16", "variant",
        "ln_bits", "debug",
    ),
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
    score_i16: bool = False,
    variant: str = "r5",
    ln_bits: int | None = None,
    debug: str = "",
) -> NWResult:
    """(matches, alignment_length) per pair — Pallas TPU fast path.

    Bit-identical to ops.nw.nw_similarity_batch (checked in
    tests/test_nw_pallas.py); use interpret=True off-TPU.

    Layout: pairs ride the 128-lane axis and DP rows the sublane axis
    for every sequence length; padding only needs (m+1) % 8 == 0.
    Wants B % 128 == 0 for full-lane vregs.
    """
    bsz, m = a_idx.shape
    n = b_idx.shape[1]
    lb = ln_bits if ln_bits is not None else _ln_bits(m + n)
    if m + n >= (1 << lb):
        raise ValueError(
            f"padded m+n = {m + n} exceeds packed-length budget "
            f"{(1 << _LN_BITS_WIDE) - 1}; use ops.nw.nw_similarity_batch"
        )
    mp1 = m + 1
    d_total = m + n
    f = _batch_split(mp1, bsz, score_i16)
    if f > 1:
        res = nw_similarity_tiles_pallas(
            a_idx.reshape(f, bsz // f, m),
            a_len.reshape(f, bsz // f),
            b_idx.reshape(f, bsz // f, n),
            b_len.reshape(f, bsz // f),
            sub,
            layout="long",
            gap_open=gap_open, gap_ext=gap_ext,
            interpret=interpret, score_i16=score_i16,
            variant=variant, ln_bits=lb, debug=debug,
        )
        return NWResult(
            matches=res.matches.reshape(bsz),
            length=res.length.reshape(bsz),
        )

    nd = _diags_per_step()
    d_pad = d_total + (-d_total % nd)
    slab, bstream = _score_slab(
        a_idx.astype(jnp.int32), b_idx.astype(jnp.int32), sub, d_pad
    )
    alen = a_len.astype(jnp.int32).reshape(1, 1, bsz)
    fd = (a_len + b_len).astype(jnp.int32).reshape(1, 1, bsz)

    out = _run_kernel(
        slab[None], bstream[None], alen, fd, (mp1, bsz), d_pad,
        gap_open, gap_ext, interpret, score_i16, nd, n,
        _band_enabled(mp1), variant, lb, debug,
    )
    packed = out[0, 0, :]
    return NWResult(
        matches=packed >> lb, length=packed & ((1 << lb) - 1)
    )


def _band_classes(mp1: int, n_classes: int | None = None) -> tuple:
    """Static sublane-window width classes for the band-limited sweep.

    Widths keep ``mp1 - W`` _ALIGN-aligned so the clamped window offset
    stays tile-aligned; degenerate/duplicate classes collapse.  More
    classes execute a tighter band (the mean executed width over a full
    sweep is ~mean(W) vs a true band mean of ~mp1/2) at the cost of
    compile time, which scales with the class count;
    DYNAALIGN_NW_BAND_CLASSES overrides the default of 10.

    Round-5 class-count sweep at mp1=568 (same window, bit-exact at
    every point): 6 -> 2.59 ms/call, 8 -> 2.54, 10 -> 2.49, then a
    Mosaic schedule CLIFF: 11 -> 14.9, 12 -> 16.6, 16 -> 20.3 ms (6-8x
    worse — past ~10 pl.when step bodies the scheduler collapses).  10
    is the measured optimum; do not raise it without re-probing
    (tools/probe_kernel.py).
    """
    if n_classes is None:
        n_classes = int(
            os.environ.get("DYNAALIGN_NW_BAND_CLASSES", "10")
        )
    widths = []
    for c in range(1, n_classes):
        slack = (mp1 * (n_classes - c) // n_classes) // _ALIGN * _ALIGN
        w = mp1 - slack
        if 64 <= w < mp1:
            widths.append(w)
    widths.append(mp1)
    return tuple(dict.fromkeys(widths))


def _band_enabled(mp1: int) -> bool:
    """Band-limit by default for grids tall enough to have dead rows
    worth skipping; DYNAALIGN_NW_BAND=0 disables, =1 forces."""
    env = os.environ.get("DYNAALIGN_NW_BAND")
    if env == "0":
        return False
    if env == "1":
        return True
    return mp1 >= 256


def _run_kernel(
    slab, bstream, alen, fd, shape, d_total, gap_open, gap_ext,
    interpret, i16=False, n_diag=2, n_cols=0, band=False,
    variant="r5", ln_bits=_LN_BITS, debug="",
):
    """Launch the wavefront kernel over a (tiles, diagonals) grid.

    ``debug`` is the measurement-only stage-ablation knob (results are
    WRONG under any non-empty value).  It is an explicit argument —
    plumbed through the public entry points' jit cache keys — so probes
    (tools/probe_kernel.py) must opt in per call; production drivers
    never set it and the environment is never consulted here.

    slab: [T, 6, Mp1, B] packed substitution rows; bstream: [T, D, B]
    per-diagonal fresh b-chars; alen/fd: [T, 1, B]; returns [T, 1, B].
    shape = (Mp1, B) state-plane shape.  The T axis runs whole
    independent pair tiles back-to-back inside one launch, so
    per-dispatch overhead is paid once per sweep, not once per tile.
    i16 stores the four score planes as int16 (halving their VMEM
    traffic); the packed (matches, length) planes stay int32.  n_diag
    diagonals are processed per grid step (D must divide evenly; must
    divide 32 when band limiting is on, so the streamed fresh-row block
    index n_diag*g - o(g) stays a whole block).
    """
    mp1 = shape[0]
    band_classes = _band_classes(mp1) if band else ()
    if band_classes and _ALIGN % n_diag:
        raise ValueError(
            f"n_diag={n_diag} must divide {_ALIGN} under band limiting"
        )
    t_tiles = slab.shape[0]
    kernel = functools.partial(
        _kernel, go=gap_open, ge=gap_ext, shape=shape,
        i16=i16,
        i16_clamp=not _i16_clamp_free(mp1, gap_open, gap_ext),
        n_diag=n_diag, n_cols=n_cols,
        band_classes=band_classes,
        variant=variant, ln_bits=ln_bits, debug=debug,
    )
    sdt = jnp.int16 if i16 else jnp.int32
    vshape = (1, shape[1])
    score_plane = lambda: pltpu.VMEM(shape, sdt)  # noqa: E731
    stat_plane = lambda: pltpu.VMEM(shape, jnp.int32)  # noqa: E731
    vec = lambda: pl.BlockSpec(  # noqa: E731
        (1,) + vshape, lambda t, g: (t, 0, 0), memory_space=pltpu.VMEM
    )

    def bstr_index(t, g):
        # fresh rows for this step start at diagonal-index n_diag*g -
        # o(g); o is a 32-aligned pure function of g (shared helper), so
        # the offset is always a whole n_diag group.  bstream is viewed
        # as [T, D/n_diag, n_diag, B] so the block's minor dims equal
        # the array dims (the TPU lowering requires minor block dims
        # divisible by (8, 128) or whole)
        _, o = _band_select(g, n_diag, mp1, n_cols, band_classes)
        return (t, g - o // n_diag, 0, 0)

    return pl.pallas_call(
        kernel,
        grid=(t_tiles, d_total // n_diag),
        in_specs=[
            pl.BlockSpec(
                (1, _N_WORDS) + shape,
                lambda t, g: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_diag, shape[1]),
                bstr_index,
                memory_space=pltpu.VMEM,
            ),
            vec(),
            vec(),
        ],
        out_specs=vec(),
        out_shape=jax.ShapeDtypeStruct((t_tiles,) + vshape, jnp.int32),
        scratch_shapes=(
            [
                score_plane(),  # rsh_b
                score_plane(),  # q_b
                stat_plane(),  # s_b
                stat_plane(),  # ssh_b
                score_plane(),  # bsh_b
                score_plane(),  # bsh_a
                stat_plane(),  # ssh_a
                stat_plane(),  # c_pl
                pltpu.VMEM(vshape, jnp.int32),  # cap
            ]
            if variant == "r5"
            else [
                score_plane(),  # best_a
                stat_plane(),  # s_a
                score_plane(),  # m_b
                score_plane(),  # ix_b
                score_plane(),  # iy_b
                stat_plane(),  # s_b
                stat_plane(),  # c_pl
                pltpu.VMEM(vshape, jnp.int32),  # cap
            ]
        ),
        interpret=interpret,
    )(
        slab,
        bstream.reshape(
            t_tiles, d_total // n_diag, n_diag, shape[1]
        ),
        alen,
        fd,
    )


@functools.partial(
    jax.jit,
    static_argnames=("layout", "gap_open", "gap_ext", "interpret",
                     "score_i16", "min_split", "variant", "ln_bits",
                     "debug"),
)
def nw_similarity_tiles_pallas(
    a_idx: jnp.ndarray,  # int32 [T, B, M]
    a_len: jnp.ndarray,  # int32 [T, B]
    b_idx: jnp.ndarray,  # int32 [T, B, N]
    b_len: jnp.ndarray,  # int32 [T, B]
    sub: jnp.ndarray,  # int32 [32, 32]
    *,
    layout: str,  # "long" | "short"
    gap_open: int = 10,
    gap_ext: int = 4,
    interpret: bool = False,
    score_i16: bool = False,
    min_split: int = 1,
    variant: str = "r5",
    ln_bits: int | None = None,
    debug: str = "",
) -> NWResult:
    """T independent pair tiles swept in ONE kernel launch.

    End-to-end all-pairs time is dominated by per-launch dispatch cost
    (each launch pays a host->device RPC); folding the tile loop into
    the Pallas grid amortises it across the whole sweep.  ``layout`` is
    kept for API compatibility; every length regime uses the
    pairs-on-lanes layout (see nw_similarity_batch_pallas).  Returns
    [T, B] (matches, length).
    """
    del layout  # single layout since the minor-axis-preserving prepass
    t_tiles, bsz, m = a_idx.shape
    n = b_idx.shape[2]
    lb = ln_bits if ln_bits is not None else _ln_bits(m + n)
    if m + n >= (1 << lb):
        raise ValueError(
            f"padded m+n = {m + n} exceeds packed-length budget "
            f"{(1 << _LN_BITS_WIDE) - 1}; use ops.nw.nw_similarity_batch"
        )
    mp1 = m + 1
    d_total = m + n
    f = _batch_split(mp1, bsz, score_i16)
    # drivers raise min_split after a terminal-side scoped-VMEM compile
    # failure (the relay pool's limit/measurement is not uniform)
    while f < min_split and bsz // f > 1 and (bsz // f) % 2 == 0:
        f *= 2
    if f > 1:
        # split each tile's batch along the tile axis so the per-launch
        # scratch fits scoped VMEM at this mp1 (consecutive pairs stay
        # consecutive, so the reshape round-trips exactly)
        res = nw_similarity_tiles_pallas(
            a_idx.reshape(t_tiles * f, bsz // f, m),
            a_len.reshape(t_tiles * f, bsz // f),
            b_idx.reshape(t_tiles * f, bsz // f, n),
            b_len.reshape(t_tiles * f, bsz // f),
            sub,
            layout="long",
            gap_open=gap_open, gap_ext=gap_ext,
            interpret=interpret, score_i16=score_i16,
            variant=variant, ln_bits=lb, debug=debug,
        )
        return NWResult(
            matches=res.matches.reshape(t_tiles, bsz),
            length=res.length.reshape(t_tiles, bsz),
        )
    nd = _diags_per_step()
    d_pad = d_total + (-d_total % nd)

    # lax.map keeps the per-tile one-hot/einsum intermediates bounded
    # (vmap would materialize all T tiles' [M, 32, B] rows at once)
    slab, bstream = jax.lax.map(
        lambda args: _score_slab(
            args[0].astype(jnp.int32), args[1].astype(jnp.int32),
            sub, d_pad,
        ),
        (a_idx, b_idx),
    )  # [T, 6, Mp1, B], [T, Dpad, B]
    alen = a_len.astype(jnp.int32).reshape(t_tiles, 1, bsz)
    fd = (a_len + b_len).astype(jnp.int32).reshape(t_tiles, 1, bsz)
    out = _run_kernel(
        slab, bstream, alen, fd, (mp1, bsz), d_pad, gap_open, gap_ext,
        interpret, score_i16, nd, n, _band_enabled(mp1), variant, lb,
        debug,
    )
    packed = out[:, 0, :]  # [T, B]
    return NWResult(
        matches=packed >> lb, length=packed & ((1 << lb) - 1)
    )


@functools.partial(
    jax.jit,
    static_argnames=("gap_open", "gap_ext", "interpret", "score_i16"),
)
def nw_similarity_batch_pallas_short(
    a_idx: jnp.ndarray,  # int32 [B, M]
    a_len: jnp.ndarray,  # int32 [B]
    b_idx: jnp.ndarray,  # int32 [B, N]
    b_len: jnp.ndarray,  # int32 [B]
    sub: jnp.ndarray,  # int32 [32, 32]
    *,
    gap_open: int = 10,
    gap_ext: int = 4,
    interpret: bool = False,
    score_i16: bool = False,
) -> NWResult:
    """Alias of :func:`nw_similarity_batch_pallas` (kept for callers that
    select the peptide-scale batch sizing by name).

    Historically the "short" kernel was the only pairs-on-lanes layout;
    the minor-axis-preserving prepass made that layout optimal for every
    length regime, so both entry points now share one implementation.
    Wants (M+1) % 8 == 0 (sublane tile) and B % 128 == 0 (lane tile).
    Bit-identical to the scan backend (tests/test_nw_pallas.py).
    """
    return nw_similarity_batch_pallas(
        a_idx, a_len, b_idx, b_len, sub,
        gap_open=gap_open, gap_ext=gap_ext, interpret=interpret,
        score_i16=score_i16,
    )


# ---------------------------------------------------------------------------
# XL regime: pairs on SUBLANES, DP rows on LANES (round 5)
#
# The standard layout's substitution slab costs 24 bytes per (DP row,
# lane), and lanes pad to 128 — so past mp1 ~ 1120 the slab plus state
# planes cannot fit scoped VMEM at ANY pair batch (Mosaic measured
# 19.56 MB at mp1=5008 even with 16 pairs).  Transposing the layout
# (pairs on the 8-sublane axis, DP rows on the 128-lane axis) shrinks
# the resident footprint 16x: at B8=8 pairs per tile, slab + planes fit
# to mp1 ~ 12k.  The xl kernel is deliberately simple — unbanded, no
# i16 (nw_i16_ok fails at these depths anyway), r4-style chaining with
# lane-axis rolls — because its competitor is the ~40x-slower scan
# backend, not the tuned standard kernel.  Bit-exact vs the scan
# backend / C++ oracle (tests/test_nw_pallas.py, tools/probe_kernel
# runs at 5,000 aa).
# ---------------------------------------------------------------------------

_XL_B8 = 8  # pairs per tile (the int32 sublane tile)
# standard-layout dispatch ceiling: lanes pad to 128, so the scoped
# VMEM cell budget implies mp1 <= ~1120 (non-i16 accounting) for the
# pairs-on-lanes kernel; beyond that the xl layout takes over
PALLAS_MAX_MP1 = 1120
# xl ceiling: 7 int32 planes + the 24 B/row slab at B8=8 stay under
# ~half the 16 MB scoped limit up to MP1L = 12288 lanes
XL_MAX_MP1 = 12288


def _kernel_xl(
    slab_ref,  # int32 [1, 6, B8, MP1L]
    bstr_ref,  # int32 [1, 1, n_diag, B8, 1] — this step's fresh b-chars
    alen_ref,  # int32 [1, B8, 1]
    fd_ref,  # int32 [1, B8, 1]
    out_ref,  # int32 [1, B8, 1] — packed (matches << ln_bits | length)
    m_b, ix_b, iy_b, s_b,
    best_a, s_a,
    c_pl,
    cap,
    *,
    go: int,
    ge: int,
    shape: tuple,  # (B8, MP1L)
    n_diag: int = 2,
    ln_bits: int = _LN_BITS,
):
    """Transposed wavefront step: DP row index rides the LANE axis, so
    the ``sh`` ancestor shift is a lane-axis roll and every mask iota
    runs along axis 1.  Semantics identical to the standard kernel's r4
    step body (same D > U > L priority, border/interior gap asymmetry,
    packed stats); no banding — every step computes the full row range
    (dead work is the price of the 16x smaller resident footprint)."""
    g = pl.program_id(1)
    b8, mp1l = shape
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)  # DP row index
    local0 = row == 0
    neg = NEG

    @pl.when(g == 0)
    def _init():
        m_b[:] = jnp.where(local0, 0, neg)
        ix_b[:] = jnp.full(shape, neg, jnp.int32)
        iy_b[:] = jnp.full(shape, neg, jnp.int32)
        s_b[:] = jnp.zeros(shape, jnp.int32)
        best_a[:] = jnp.full(shape, neg, jnp.int32)
        s_a[:] = jnp.zeros(shape, jnp.int32)
        c_pl[:] = jnp.zeros(shape, jnp.int32)
        cap[:] = jnp.zeros((b8, 1), jnp.int32)

    def sh(x):  # shifted[i] = x[i-1] along the lane (row) axis
        return pltpu.roll(x, 1, 1)

    sw = [slab_ref[0, k] for k in range(_N_WORDS)]

    def score_diag(c):
        sha = (c & 3) << 3
        b2 = (c & 4) != 0
        b3 = (c & 8) != 0
        b4 = (c & 16) != 0
        t0 = jnp.where(b2, sw[1], sw[0])
        t1 = jnp.where(b2, sw[3], sw[2])
        t2 = jnp.where(b2, sw[5], sw[4])
        u0 = jnp.where(b3, t1, t0)
        v = jnp.where(b4, t2, u0)
        s2 = ((v >> sha) & 0xFF) - _BIAS
        return s2 >> 1, s2 & 1

    def cell(d1, score, match, prev, prev2):
        pM, pIx, pIy, pS = prev
        qBest, qS = prev2
        ix = jnp.maximum(sh(pM) - (go + ge), sh(pIx) - ge)
        iy = jnp.maximum(pM - (go + ge), pIy - ge)
        mnew = sh(qBest) + score
        mxy = jnp.maximum(ix, iy)
        d_sel = mnew >= mxy  # priority D > U > L
        m_cell = jnp.maximum(mnew, mxy)
        s_cell = (
            jnp.where(
                d_sel,
                sh(qS) + (match << ln_bits),
                jnp.where(ix >= iy, sh(pS), pS),
            )
            + 1
        )
        border_gap = -go - (d1 - 1) * ge
        is0 = local0
        isd = row == d1
        m_cell = jnp.where(is0 | isd, neg, m_cell)
        ix = jnp.where(isd, border_gap, jnp.where(is0, neg, ix))
        iy = jnp.where(is0, border_gap, jnp.where(isd, neg, iy))
        s_cell = jnp.where(is0 | isd, d1, s_cell)
        best = jnp.maximum(m_cell, jnp.maximum(ix, iy))

        row_hit = fd_ref[0] == d1  # [B8, 1]

        @pl.when(jnp.any(row_hit))
        def _():
            hit = row_hit & (alen_ref[0] == row)
            cap[:] += jnp.sum(
                jnp.where(hit, s_cell, 0), axis=1, keepdims=True
            )

        return m_cell, ix, iy, s_cell, best

    d0 = n_diag * g
    bm = m_b[:]
    bix = ix_b[:]
    biy = iy_b[:]
    prev = (bm, bix, biy, s_b[:])
    prev2 = (best_a[:], s_a[:])
    prev_best = jnp.maximum(bm, jnp.maximum(bix, biy))
    c_cur = c_pl[:]
    for t in range(n_diag):
        c_cur = jnp.where(local0, bstr_ref[0, 0, t], sh(c_cur))
        score, match = score_diag(c_cur)
        new = cell(d0 + t + 1, score, match, prev, prev2)
        prev2 = (prev_best, prev[3])
        prev = new[:4]
        prev_best = new[4]
    c_pl[:] = c_cur
    best_a[:] = prev2[0]
    s_a[:] = prev2[1]
    m_b[:] = prev[0]
    ix_b[:] = prev[1]
    iy_b[:] = prev[2]
    s_b[:] = prev[3]

    @pl.when(g == pl.num_programs(1) - 1)
    def _emit():
        out_ref[0] = cap[:]


@functools.partial(
    jax.jit,
    static_argnames=("gap_open", "gap_ext", "interpret"),
)
def nw_similarity_batch_pallas_xl(
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
    """Multi-kilobase NW fast path (pairs-on-sublanes xl layout).

    Serves padded m+1 up to XL_MAX_MP1 (and padded m+n < 32768, the
    wide packed-stats budget) where the standard layout's VMEM-resident
    slab cannot fit.  Same reference semantics, bit-identical results
    (src/pairwiseSeqAlign.cpp:209-313 has no length limit; this closes
    the framework's former multi-kilobase cliff to the scan backend)."""
    bsz, m = a_idx.shape
    n = b_idx.shape[1]
    lb = _ln_bits(m + n)
    if m + n >= (1 << _LN_BITS_WIDE):
        raise ValueError(
            f"padded m+n = {m + n} exceeds packed-length budget "
            f"{(1 << _LN_BITS_WIDE) - 1}; use ops.nw.nw_similarity_batch"
        )
    mp1 = m + 1
    if mp1 > XL_MAX_MP1:
        raise ValueError(
            f"padded m+1 = {mp1} exceeds the xl kernel ceiling "
            f"{XL_MAX_MP1}; use ops.nw.nw_similarity_batch"
        )
    mp1l = -(-mp1 // 128) * 128
    b8 = _XL_B8
    t_tiles = -(-bsz // b8)
    pad = t_tiles * b8 - bsz
    if pad:
        a_idx = jnp.pad(a_idx, ((0, pad), (0, 0)))
        a_len = jnp.pad(a_len, ((0, pad),))
        b_idx = jnp.pad(b_idx, ((0, pad), (0, 0)))
        b_len = jnp.pad(b_len, ((0, pad),))
    nd = 2
    d_total = m + n
    d_pad = d_total + (-d_total % nd)
    slab, bstream = _score_slab(
        a_idx.astype(jnp.int32), b_idx.astype(jnp.int32), sub, d_pad
    )  # [6, Mp1, T*B8], [Dpad, T*B8]
    slab = jnp.pad(slab, ((0, 0), (0, mp1l - mp1), (0, 0)))
    slab_xl = jnp.transpose(slab, (2, 0, 1)).reshape(
        t_tiles, b8, _N_WORDS, mp1l
    ).transpose(0, 2, 1, 3)  # [T, 6, B8, MP1L]
    bstr_xl = jnp.transpose(bstream, (1, 0)).reshape(
        t_tiles, b8, d_pad // nd, nd
    ).transpose(0, 2, 3, 1)[..., None]  # [T, Dpad/nd, nd, B8, 1]
    alen = a_len.astype(jnp.int32).reshape(t_tiles, b8, 1)
    fd = (a_len + b_len).astype(jnp.int32).reshape(t_tiles, b8, 1)

    shape = (b8, mp1l)
    kernel = functools.partial(
        _kernel_xl, go=gap_open, ge=gap_ext, shape=shape, n_diag=nd,
        ln_bits=lb,
    )
    plane = lambda: pltpu.VMEM(shape, jnp.int32)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(t_tiles, d_pad // nd),
        in_specs=[
            pl.BlockSpec(
                (1, _N_WORDS) + shape,
                lambda t, g: (t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, nd, b8, 1),
                lambda t, g: (t, g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b8, 1), lambda t, g: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, b8, 1), lambda t, g: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, b8, 1), lambda t, g: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_tiles, b8, 1), jnp.int32),
        scratch_shapes=[
            plane(),  # m_b
            plane(),  # ix_b
            plane(),  # iy_b
            plane(),  # s_b
            plane(),  # best_a
            plane(),  # s_a
            plane(),  # c_pl
            pltpu.VMEM((b8, 1), jnp.int32),  # cap
        ],
        interpret=interpret,
    )(
        slab_xl,
        bstr_xl,
        alen,
        fd,
    )
    packed = out.reshape(t_tiles * b8)[:bsz]
    return NWResult(
        matches=packed >> lb, length=packed & ((1 << lb) - 1)
    )
