"""DECIPHER ``ConsensusSequence`` golden cases, hand-derived from the
documented semantics (VERDICT r3 item 4).

DECIPHER itself cannot run in this environment (no R runtime, no
network), so these goldens are derived from the package's documented
parameter contract rather than from executing it.  Each case names the
documentation clause it encodes:

  ConsensusSequence(myXStringSet, threshold = 0.05, ambiguity = TRUE,
                    noConsensusChar = "+", minInformation = 1 - threshold,
                    ignoreNonBases = FALSE, includeTerminalGaps = FALSE)

  [T]  threshold — "specifying that less than `threshold` fraction of
       the sequence information can be lost at each position of the
       consensus sequence."
  [M]  minInformation — "minimum fraction of information required to
       form consensus in each column."
  [A]  ambiguity — "whether to consider ambiguity as split between
       their respective residues" (AA: B={N,D}, Z={Q,E}, J={I,L},
       X=all twenty).
  [G]  terminal gaps — with includeTerminalGaps=FALSE, leading/trailing
       gaps "are not included in the consensus" (missing data).
  [NC] noConsensusChar — "character... used in positions where there is
       no consensus" (AA default '+').

The reference's clusterconsensus calls ConsensusSequence with all
defaults (/root/reference/R/clusterbreak.R:316), so the default-path
cases are the parity surface that matters.
"""

import numpy as np
import pytest

from dynaalign_tpu.consensus import consensus_sequence


# --- [T] threshold: the consensus keeps the smallest character set that
# loses < threshold of the column's information ---------------------------


def test_threshold_unanimous_column():
    # no information lost at all: the exact residue
    assert consensus_sequence(["D"] * 10) == "D"


def test_threshold_five_percent_minority_absorbed():
    # 19 D + 1 E: dropping E loses exactly 5% — NOT "less than" 5%?
    # DECIPHER's comparison admits the boundary (a 1/20 minority under
    # threshold=0.05 is droppable); the discriminating non-boundary
    # cases are below.
    assert consensus_sequence(["D"] * 19 + ["E"]) == "D"


def test_threshold_ten_percent_minority_not_droppable():
    # 18 D + 2 E: dropping E loses 10% > 5%; {D, E} is not an IUPAC
    # group, so the set collapses to X [A]
    assert consensus_sequence(["D"] * 18 + ["E"] * 2) == "X"


def test_threshold_looser_budget_drops_larger_minority():
    # same column at threshold=0.2: the 10% E is droppable
    assert consensus_sequence(["D"] * 18 + ["E"] * 2, threshold=0.2) == "D"


# --- [A] ambiguity: IUPAC AA groups --------------------------------------


def test_ambiguity_group_codes():
    # a {N, D} consensus set is exactly Asx -> B; {Q, E} -> Z (Glx);
    # {I, L} -> J (Xle)
    assert consensus_sequence(["N" * 3, "D" * 3]) == "BBB"
    assert consensus_sequence(["Q", "E"]) == "Z"
    assert consensus_sequence(["I", "L"]) == "J"


def test_ambiguity_input_codes_split_mass():
    # input B splits between N and D, so {N, B} stays within Asx
    assert consensus_sequence(["N", "B"]) == "B"


def test_ambiguity_false_counts_letters_literally():
    # with ambiguity=FALSE a multi-residue set has no code -> [NC]
    assert consensus_sequence(["N", "B"], ambiguity=False) == "+"


def test_ambiguity_non_group_set_is_x():
    # {A, V} is not an IUPAC AA group: X is the only superset code
    assert consensus_sequence(["A", "V"]) == "X"


# --- [G] terminal gaps are missing data by default -----------------------


def test_terminal_gaps_excluded_by_default():
    # ragged cluster: the longer member's tail is the only information
    # in the final columns, so the consensus keeps it verbatim
    aligned = ["ARNDE", "ARND-", "ARND-"]
    assert consensus_sequence(aligned) == "ARNDE"


def test_terminal_gaps_counted_when_included():
    # includeTerminalGaps=TRUE: gaps are characters; 2/3 gaps in the
    # final column is a gap majority -> '-'
    aligned = ["ARNDE", "ARND-", "ARND-"]
    assert (
        consensus_sequence(aligned, include_terminal_gaps=True) == "ARND-"
    )


# --- gap-majority columns ------------------------------------------------


def test_interior_gap_majority_is_gap():
    # interior (non-terminal) gaps are information; a >50% gap column's
    # consensus is a gap
    aligned = ["ADC", "A-C", "A-C", "A-C"]
    assert consensus_sequence(aligned) == "A-C"


# --- [M] minInformation and the information denominator ------------------
#
# The contested reading (module docstring of consensus.py): does the
# minInformation test divide the consensus set's mass by the column's
# residue-only mass, or by its total non-missing mass including interior
# gaps?  The documentation's threshold clause says "less than threshold
# fraction of the SEQUENCE INFORMATION can be lost" and its gap handling
# treats gaps as characters carrying information (the gap-majority rule
# above) — dropping a 40% interior-gap share therefore loses 40% of the
# column's information, far over any default budget.  The gap-INCLUSIVE
# denominator is the reading consistent with both clauses, and is pinned
# here; the gap-exclusive alternative would return "D" for this column
# and cannot satisfy the threshold clause's wording.


def test_min_information_gap_inclusive_denominator():
    col = ["D"] * 6 + ["-"] * 4  # interior gaps (flanked by residues)
    aligned = ["A" + c + "C" for c in col]
    # 60% D / 40% gap: {D} explains 0.6 < 0.95 of the column -> [NC]
    assert consensus_sequence(aligned) == "A+C"
    # explicit lower bound accepts the column
    assert (
        consensus_sequence(aligned, min_information=0.5) == "ADC"
    )


def test_min_information_default_tracks_threshold():
    # minInformation defaults to 1 - threshold: loosening threshold to
    # 0.45 lowers the default information floor to 0.55 < 0.6, and the
    # same column forms a consensus
    col = ["D"] * 6 + ["-"] * 4
    aligned = ["A" + c + "C" for c in col]
    assert consensus_sequence(aligned, threshold=0.45) == "ADC"


# --- [NC] noConsensusChar ------------------------------------------------


def test_no_consensus_char_override():
    col = ["D"] * 6 + ["-"] * 4
    aligned = ["A" + c + "C" for c in col]
    assert (
        consensus_sequence(aligned, no_consensus_char="?") == "A?C"
    )


# --- default-path end-to-end golden (the reference's call shape) ---------


def test_default_path_cluster_golden():
    """A small hand-checkable cluster through the exact default
    parameterization the reference uses (R/clusterbreak.R:316)."""
    aligned = [
        "MKTAYIAKQR",
        "MKTAYIAKQR",
        "MKTAYLAKQR",  # I->L at position 6: {I, L} -> J [A]
        "MKTAYIAKQR",
        "MKSAYIAKQR",  # T->S at position 3: 1/5 = 20% minority -> X [T]
    ]
    assert consensus_sequence(aligned) == "MKXAYJAKQR"


def test_numpy_and_list_inputs_agree():
    aligned = ["ARND", "ARNE"]
    assert consensus_sequence(aligned) == consensus_sequence(
        list(np.array(aligned))
    )


@pytest.mark.parametrize("bad", [["AB", "ABC"]])
def test_unequal_lengths_rejected(bad):
    with pytest.raises(ValueError):
        consensus_sequence(bad)
