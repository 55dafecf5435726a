"""NW wavefront kernel vs the bit-exact C++ oracle."""

import numpy as np
import pytest

from dynaalign_tpu import blosum, encode, oracle
from dynaalign_tpu.ops.nw import nw_similarity_batch


def _run_batch(pairs, matrix="BLOSUM62", gap_open=10, gap_ext=4):
    a_seqs = [p[0] for p in pairs]
    b_seqs = [p[1] for p in pairs]
    ea = encode.encode(a_seqs)
    eb = encode.encode(b_seqs)
    sub = blosum.get_matrix(matrix)
    res = nw_similarity_batch(
        ea.indices, ea.lengths, eb.indices, eb.lengths, sub,
        gap_open=gap_open, gap_ext=gap_ext,
    )
    return res.similarity()


def _oracle_vals(pairs, matrix="BLOSUM62", gap_open=10, gap_ext=4):
    return np.array(
        [oracle.nw_pair(a, b, matrix, gap_open, gap_ext) for a, b in pairs]
    )


def test_identity_pair():
    s = "ARNDCQEGHIKLMFP"
    sims = _run_batch([(s, s)])
    assert sims[0] == 1.0


def test_simple_pairs_bit_exact():
    pairs = [
        ("ARNDCQEG", "ARNDCQEG"),
        ("ARNDCQEG", "ARNXCQEG"),
        ("AAAA", "AAAAAAAA"),
        ("WWWW", "AAAA"),
        ("A", "ARNDCQEGHILKMFPSTWYV"),
        ("ARND", "DNRA"),
    ]
    np.testing.assert_array_equal(_run_batch(pairs), _oracle_vals(pairs))


@pytest.mark.parametrize("matrix", ["BLOSUM45", "BLOSUM62", "BLOSUM100"])
@pytest.mark.parametrize("gaps", [(10, 4), (5, 1), (12, 2)])
def test_random_pairs_bit_exact(matrix, gaps, make_seqs):
    go, ge = gaps
    seqs = make_seqs(40, 3, 60)
    pairs = list(zip(seqs[:20], seqs[20:]))
    got = _run_batch(pairs, matrix, go, ge)
    want = _oracle_vals(pairs, matrix, go, ge)
    np.testing.assert_array_equal(got, want)


def test_random_pairs_ambiguity_codes(make_seqs):
    # include ambiguity codes B, Z, X and stop '*'
    seqs = make_seqs(20, 5, 40, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:10], seqs[10:]))
    np.testing.assert_array_equal(_run_batch(pairs), _oracle_vals(pairs))


def test_many_random_pairs_bit_exact(make_seqs):
    # broad fuzz: ragged lengths, one padded shape
    seqs = make_seqs(200, 1, 80)
    pairs = list(zip(seqs[:100], seqs[100:]))
    got = _run_batch(pairs)
    want = _oracle_vals(pairs)
    np.testing.assert_array_equal(got, want)


def test_longer_sequences_bit_exact(make_seqs):
    seqs = make_seqs(8, 150, 300)
    pairs = list(zip(seqs[:4], seqs[4:]))
    np.testing.assert_array_equal(_run_batch(pairs), _oracle_vals(pairs))
