"""Round-5 consensus evidence (VERDICT item 6).

Two independent lines of evidence, within this environment's limits
(DECIPHER/Biostrings cannot run here):

1. Property fuzz of ``consensus_sequence`` invariants across random
   gapped alignments — threshold monotonicity, ambiguity-expansion
   conservation, terminal-gap exclusion.
2. ``nw_align_pair`` cross-checked against an INDEPENDENT brute-force
   alignment enumerator (no DP, no shared code) under the reference's
   exact gap conventions, following the reference's own external
   cross-check protocol (workspace/yulinWspc.Rmd:823-846 compared
   similarityNW against Biostrings pairwiseAlignment), plus literal
   hand-derived goldens.  The known, documented convention difference
   vs Biostrings: leading gap runs cost gapOpen + (L-1)*gapExt
   (src/pairwiseSeqAlign.cpp:222-235) while Biostrings prices every
   run at gapOpening + L*gapExtension — bounded by 2*gap_ext per
   alignment, asserted below.
"""

import itertools

import numpy as np
import pytest

from dynaalign_tpu import blosum
from dynaalign_tpu.consensus.consensus import consensus_sequence
from dynaalign_tpu.consensus.msa import nw_align_pair

AAS = list("ARNDCQEGHILKMFPSTWYV")


# ---------------------------------------------------------------------------
# 1. consensus_sequence property fuzz
# ---------------------------------------------------------------------------

def _random_alignment(rng, n_rows=None, length=None, ambiguity=True):
    n_rows = n_rows or int(rng.integers(2, 9))
    length = length or int(rng.integers(3, 14))
    letters = AAS + (["B", "Z", "J", "X"] if ambiguity else [])
    rows = []
    for _ in range(n_rows):
        row = rng.choice(letters, size=length).tolist()
        # interior gaps
        for p in range(length):
            if rng.random() < 0.15:
                row[p] = "-"
        # terminal gaps
        lead = int(rng.integers(0, max(length // 2, 1)))
        trail = int(rng.integers(0, max(length // 2, 1)))
        for p in range(lead):
            row[p] = "-"
        for p in range(length - trail, length):
            row[p] = "-"
        rows.append("".join(row))
    return rows


def _rank(ch):
    """Specificity rank: std residue < IUPAC group < X."""
    if ch in "BZJ":
        return 1
    if ch == "X":
        return 2
    return 0


def test_threshold_monotone_specificity():
    """Raising the threshold shrinks every column's consensus set, so
    the emitted code can only become MORE specific (X -> group ->
    single residue), never less.  min_information pinned to 0 to
    isolate the threshold clause."""
    rng = np.random.default_rng(0)
    for _ in range(40):
        rows = _random_alignment(rng)
        prev = None
        for t in (0.0, 0.1, 0.3, 0.6, 0.9, 1.0):
            cur = consensus_sequence(rows, t, min_information=0.0)
            if prev is not None:
                for a, b in zip(prev, cur):
                    if a in "-+" or b in "-+":
                        # gap-majority / empty columns are threshold
                        # independent
                        assert a == b
                        continue
                    assert _rank(b) <= _rank(a), (rows, prev, cur)
            prev = cur
        # at threshold 1.0 the consensus set is a single residue
        assert all(_rank(c) == 0 for c in prev if c not in "-+")


def test_ambiguity_expansion_conservation():
    """A 'B' row carries exactly the mass of half an N row plus half a
    D row — so doubling every row and replacing 2x'B' with one 'N' row
    and one 'D' row leaves all column proportions (and hence the
    consensus at every threshold) unchanged.  Same for Z and J."""
    rng = np.random.default_rng(1)
    for code, (x, y) in (("B", "ND"), ("Z", "QE"), ("J", "IL")):
        for _ in range(10):
            base = _random_alignment(rng, ambiguity=False)
            L = len(base[0])
            pos = int(rng.integers(0, L))
            amb_row = list(rng.choice(AAS, size=L))
            amb_row[pos] = code
            with_amb = [r * 1 for r in base] * 2 + ["".join(amb_row)] * 2
            split_x = amb_row.copy()
            split_x[pos] = x
            split_y = amb_row.copy()
            split_y[pos] = y
            with_split = [r * 1 for r in base] * 2 + [
                "".join(split_x), "".join(split_y)
            ]
            for t in (0.0, 0.05, 0.3, 0.7):
                assert consensus_sequence(
                    with_amb, t
                ) == consensus_sequence(with_split, t)


def test_terminal_gap_exclusion():
    """With include_terminal_gaps=False (the DECIPHER default), rows of
    pure gaps and terminal-gap positions are missing data: they change
    nothing.  With True they are gap characters and can flip a column
    to gap-majority."""
    rng = np.random.default_rng(2)
    for _ in range(25):
        rows = _random_alignment(rng)
        L = len(rows[0])
        padded = rows + ["-" * L] * 3
        for t in (0.05, 0.4):
            assert consensus_sequence(rows, t) == consensus_sequence(
                padded, t
            )
    # concrete: a leading '-' that is terminal is excluded ...
    assert consensus_sequence(["AAA", "--A"]) == "AAA"
    # ... but counted as a gap character when included — and a
    # gap-majority column (> 0.5) emits '-'
    assert (
        consensus_sequence(
            ["AAA", "--A", "--A"], include_terminal_gaps=True
        )
        == "--A"
    )


def test_gap_majority_and_empty_columns():
    # exactly half gaps is NOT a majority (> 0.5 strict);
    # min_information=0 isolates the gap rule from the documented
    # gap-inclusive min_information divergence (consensus.py:30-48),
    # under which the default would emit '+' here (3/4 < 0.95)
    assert consensus_sequence(
        ["A-", "A-", "-C", "AC"], include_terminal_gaps=True,
        min_information=0.0,
    )[0] == "A"
    # ... and the documented divergence itself, pinned:
    assert consensus_sequence(
        ["A-", "A-", "-C", "AC"], include_terminal_gaps=True
    )[0] == "+"
    # 3/4 interior gaps IS a majority
    assert consensus_sequence(["A-A", "A-A", "A-A", "ACA"])[1] == "-"


# ---------------------------------------------------------------------------
# 2. nw_align_pair vs an independent brute-force enumerator
# ---------------------------------------------------------------------------

def _sub(matrix="BLOSUM62"):
    m = blosum.get_matrix(matrix, padded=False)
    order = "ARNDCQEGHILKMFPSTWYVBZX*"
    return {
        (a, b): int(m[i, j])
        for i, a in enumerate(order)
        for j, b in enumerate(order)
    }


def _ops_enum(m, n):
    """All global-alignment op strings (D/U/L) for lengths (m, n)."""
    if m == 0 and n == 0:
        yield ""
        return
    if m > 0 and n > 0:
        for rest in _ops_enum(m - 1, n - 1):
            yield "D" + rest
    if m > 0:
        for rest in _ops_enum(m - 1, n):
            yield "U" + rest
    if n > 0:
        for rest in _ops_enum(m, n - 1):
            yield "L" + rest


def _score_ops(ops, s1, s2, sub, go, ge, convention):
    """Score one alignment under 'reference' or 'biostrings' gap rules.

    reference: the LEADING run (starting at alignment position 0) costs
    go + (L-1)*ge (the DP border init); every other run go + L*ge; a
    second gap run immediately following the leading run is unreachable
    in the reference DP (row-0/col-0 cells hold sentinels for the other
    gap matrix) -> -inf.  biostrings: every run costs go + L*ge.
    """
    score = 0.0
    i = j = 0
    runs = []  # (start_pos, length, kind)
    for p, op in enumerate(ops):
        if op == "D":
            score += sub[(s1[i], s2[j])]
            i += 1
            j += 1
        else:
            if runs and runs[-1][0] + runs[-1][1] == p and (
                runs[-1][2] == op
            ):
                runs[-1] = (runs[-1][0], runs[-1][1] + 1, op)
            else:
                runs.append((p, 1, op))
            if op == "U":
                i += 1
            else:
                j += 1
    for start, length, _ in runs:
        if convention == "reference" and start == 0:
            score -= go + (length - 1) * ge
        else:
            score -= go + length * ge
    if convention == "reference" and len(runs) >= 2:
        a, b = runs[0], runs[1]
        if a[0] == 0 and b[0] == a[0] + a[1]:
            return -np.inf  # U..UL.. / L..LU.. prefix unreachable
    return score


def _aligned_to_ops(a, b):
    ops = []
    for x, y in zip(a, b):
        ops.append("U" if y == "-" else ("L" if x == "-" else "D"))
    return "".join(ops)


def _naive_greedy_align(s1, s2, sub, go, ge):
    """Independent reference-semantics aligner: plain triple-loop Gotoh
    with the in-place best overwrite of M and the greedy D > U > L
    traceback — a direct transcription of
    src/pairwiseSeqAlign.cpp:209-313, sharing NO code with the
    vectorized prefix-scan row DP or the native C++ kernel it
    cross-checks."""
    m, n = len(s1), len(s2)
    NEG = -(10 ** 9)
    M = [[NEG] * (n + 1) for _ in range(m + 1)]
    Ix = [[NEG] * (n + 1) for _ in range(m + 1)]
    Iy = [[NEG] * (n + 1) for _ in range(m + 1)]
    tb = [[""] * (n + 1) for _ in range(m + 1)]
    M[0][0] = 0
    for i in range(1, m + 1):
        Ix[i][0] = -go - (i - 1) * ge
        tb[i][0] = "U"
    for j in range(1, n + 1):
        Iy[0][j] = -go - (j - 1) * ge
        tb[0][j] = "L"
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            ix = max(M[i - 1][j] - (go + ge), Ix[i - 1][j] - ge)
            iy = max(M[i][j - 1] - (go + ge), Iy[i][j - 1] - ge)
            mnew = (
                max(M[i - 1][j - 1], Ix[i - 1][j - 1], Iy[i - 1][j - 1])
                + sub[(s1[i - 1], s2[j - 1])]
            )
            if mnew >= ix and mnew >= iy:
                M[i][j] = mnew
                tb[i][j] = "D"
            elif ix >= iy:
                M[i][j] = ix
                tb[i][j] = "U"
            else:
                M[i][j] = iy
                tb[i][j] = "L"
            Ix[i][j] = ix
            Iy[i][j] = iy
    a, b = [], []
    i, j = m, n
    while i > 0 or j > 0:
        t = tb[i][j]
        if t == "D":
            a.append(s1[i - 1])
            b.append(s2[j - 1])
            i -= 1
            j -= 1
        elif t == "U":
            a.append(s1[i - 1])
            b.append("-")
            i -= 1
        else:
            a.append("-")
            b.append(s2[j - 1])
            j -= 1
    return "".join(reversed(a)), "".join(reversed(b))


@pytest.mark.parametrize("matrix,go,ge", [
    ("BLOSUM62", 10, 4),
    ("BLOSUM45", 10, 4),  # the reference's own cross-check config
    ("BLOSUM62", 5, 1),
])
def test_align_pair_vs_independent_dp(matrix, go, ge):
    """nw_align_pair reproduces the naive reference-transcription DP's
    alignment EXACTLY, and the brute-force enumerator bounds document
    the conventions: the reference's greedy single-matrix traceback is
    NOT guaranteed affine-optimal (the fuzz finds real instances — e.g.
    YTM/HLQIG scores -25 along the greedy path vs the -17 true optimum)
    and the Biostrings-convention optimum sits within 2*ge of the
    reference-convention optimum (the leading-run border discount)."""
    sub = _sub(matrix)
    rng = np.random.default_rng(7)
    saw_suboptimal = False
    for _ in range(30):
        m = int(rng.integers(1, 6))
        n = int(rng.integers(1, 6))
        s1 = "".join(rng.choice(AAS, size=m))
        s2 = "".join(rng.choice(AAS, size=n))
        got = nw_align_pair(s1, s2, matrix, go, ge)
        want = _naive_greedy_align(s1, s2, sub, go, ge)
        assert got == want, (s1, s2, got, want)
        scores_ref = [
            _score_ops(ops, s1, s2, sub, go, ge, "reference")
            for ops in _ops_enum(m, n)
        ]
        scores_bio = [
            _score_ops(ops, s1, s2, sub, go, ge, "biostrings")
            for ops in _ops_enum(m, n)
        ]
        best_ref = max(scores_ref)
        best_bio = max(scores_bio)
        mine = _score_ops(
            _aligned_to_ops(*got), s1, s2, sub, go, ge, "reference"
        )
        assert mine <= best_ref
        saw_suboptimal |= mine < best_ref
        assert best_ref - 2 * ge <= best_bio <= best_ref + 2 * ge
    del saw_suboptimal  # informational; frequency varies with params


def test_align_pair_pid_matches_cpp_oracle():
    """Percent identity along nw_align_pair's alignment equals the C++
    oracle's similarityNW value on the same pair: the host MSA aligner
    and the reference-transcription oracle walk the same greedy
    traceback (integer scores are exact in float64, so the float row DP
    makes identical comparisons)."""
    from dynaalign_tpu import oracle

    rng = np.random.default_rng(11)
    for _ in range(25):
        s1 = "".join(rng.choice(AAS, size=rng.integers(5, 60)))
        s2 = "".join(rng.choice(AAS, size=rng.integers(5, 60)))
        a, b = nw_align_pair(s1, s2)
        matches = sum(
            1 for x, y in zip(a, b) if x == y and x != "-"
        )
        pid = matches / len(a)
        assert pid == oracle.nw_pair(s1, s2, "BLOSUM62", 10, 4), (
            s1, s2,
        )


def test_align_pair_hand_goldens():
    """Literal hand-derived alignments (BLOSUM62, 10/4).

    "AW" vs "W": leading deletion of A costs 10 (border run, L=1), then
    W~W = +11 -> score 1; aligning A~W (-3) with a trailing deletion
    (-14) scores -17.  "HEW" vs "HW": interior deletion of E costs 14;
    H~H (8) + W~W (11) - 14 = 5 beats every substitution alternative.
    """
    assert nw_align_pair("AW", "W") == ("AW", "-W")
    assert nw_align_pair("HEW", "HW") == ("HEW", "H-W")
    a, b = nw_align_pair("HEAGAWGHEE", "HEAGAWGHEE")
    assert a == b == "HEAGAWGHEE"
