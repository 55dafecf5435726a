"""MSA + consensus layer."""

import numpy as np
import pytest

from dynaalign_tpu.consensus import (
    cluster_consensus,
    consensus_sequence,
    nw_align_pair,
    progressive_msa,
)


def test_align_identical():
    a, b = nw_align_pair("ARNDCQ", "ARNDCQ")
    assert a == b == "ARNDCQ"


def test_align_with_gap():
    a, b = nw_align_pair("ARNDCQEG", "ARNDEG")
    assert len(a) == len(b)
    assert a.replace("-", "") == "ARNDCQEG"
    assert b.replace("-", "") == "ARNDEG"
    assert "-" in b and "-" not in a


def test_align_scores_sensible():
    # a substitution should align without gaps
    a, b = nw_align_pair("ARNDCQEG", "ARNYCQEG")
    assert a == "ARNDCQEG" and b == "ARNYCQEG"


def test_progressive_msa_identical():
    seqs = ["ARNDCQEG"] * 4
    aligned = progressive_msa(seqs)
    assert aligned == seqs


def test_progressive_msa_basic():
    seqs = ["ARNDCQEG", "ARNDCEG", "ARNDCQEG", "ARNCQEG"]
    aligned = progressive_msa(seqs)
    L = len(aligned[0])
    assert all(len(s) == L for s in aligned)
    for orig, al in zip(seqs, aligned):
        assert al.replace("-", "") == orig


def test_progressive_msa_single_and_empty():
    assert progressive_msa(["ARND"]) == ["ARND"]
    assert progressive_msa([]) == []


def test_consensus_majority():
    aligned = ["ARND", "ARND", "ARNE"]
    # E has freq 1/3 > 0.05 and D 2/3: {D,E} is not an ambiguity group -> X
    assert consensus_sequence(aligned) == "ARNX"
    # with a higher per-char threshold the minority E is ignored
    assert consensus_sequence(aligned, threshold=0.4) == "ARND"


def test_consensus_ambiguity_codes():
    assert consensus_sequence(["AN", "AD"]) == "AB"  # {N,D} -> B
    assert consensus_sequence(["AQ", "AE"]) == "AZ"  # {Q,E} -> Z
    assert consensus_sequence(["AI", "AL"]) == "AJ"  # {I,L} -> J


def test_consensus_gap_column():
    assert consensus_sequence(["A-ND", "A-ND", "ARND"]) == "A-ND"


def test_cluster_consensus_reference_example():
    # mock clustered matrix from the reference docs (R/clusterbreak.R:295-305)
    clustered = np.array(
        [
            ["AAAA", "1"],
            ["AAAB", "1"],
            ["AAAC", "1"],
            ["BBBB", "2"],
            ["BBBC", "2"],
            ["BBBB", "2"],
            ["CCCC", "3"],
            ["CCCD", "3"],
        ],
        dtype=object,
    )
    out = cluster_consensus(clustered)
    assert out.shape == (3, 2)
    assert list(out[:, 0]) == ["1", "2", "3"]
    # first three chars are unanimous in every cluster
    assert out[0, 1][:3] == "AAA"
    assert out[1, 1][:3] == "BBB"
    assert out[2, 1][:3] == "CCC"


def test_cluster_consensus_validation():
    with pytest.raises(ValueError):
        cluster_consensus(np.array(["AAAA", "BBBB"], dtype=object))
