"""Length-bucketed NW all-pairs: bit-identical to the dense driver."""

import numpy as np
import pytest

from dynaalign_tpu import oracle
from dynaalign_tpu.api import similarity_nw_bucketed


def test_bucketed_bit_exact_mixed_lengths(make_seqs, rng):
    # a deliberately mixed workload: short probes and long proteins
    short = make_seqs(15, 8, 14)
    longer = make_seqs(10, 150, 250)
    # interleave so bucket positions are non-contiguous
    seqs = []
    for i in range(max(len(short), len(longer))):
        if i < len(short):
            seqs.append(short[i])
        if i < len(longer):
            seqs.append(longer[i])
    got = similarity_nw_bucketed(seqs, batch=16)
    want = oracle.nw_similarity(seqs, n_threads=0)
    np.testing.assert_array_equal(got, want)


def test_bucketed_single_bucket(make_seqs):
    seqs = make_seqs(12, 20, 40)
    got = similarity_nw_bucketed(seqs, batch=8)
    want = oracle.nw_similarity(seqs)
    np.testing.assert_array_equal(got, want)


def test_bucketed_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        similarity_nw_bucketed([])
