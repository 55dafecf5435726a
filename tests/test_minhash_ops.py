"""MinHash JAX kernels vs the bit-exact C++ oracle."""

import numpy as np
import pytest

from dynaalign_tpu import encode, oracle
from dynaalign_tpu.ops.minhash import (
    minhash_signatures,
    signature_similarity,
)
from dynaalign_tpu.utils import hash_family_seeds


def test_hash_family_matches_cpp():
    for seed in (0, 1, 12345, 2**31):
        np.testing.assert_array_equal(
            hash_family_seeds(64, seed), oracle.hash_family(64, seed)
        )


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5, 7, 8, 12])
def test_murmur_kmer_hashes_match_oracle(k, make_seqs):
    seqs = make_seqs(20, k, 40)
    enc = encode.encode(seqs)
    seeds = hash_family_seeds(8, seed=99)
    from dynaalign_tpu.ops.murmur3 import murmur3_kmer_hashes

    h = np.asarray(murmur3_kmer_hashes(enc.ascii, k, seeds))
    for i, s in enumerate(seqs):
        for p in range(len(s) - k + 1):
            kmer = s[p : p + k].encode()
            for hi, seed in enumerate(seeds):
                assert h[i, p, hi] == oracle.murmur3_32(kmer, int(seed)), (
                    i, p, hi,
                )


@pytest.mark.parametrize("k,n_hash", [(2, 50), (4, 50), (5, 17)])
def test_signatures_match_oracle(k, n_hash, make_seqs):
    seqs = make_seqs(50, 8, 60)
    enc = encode.encode(seqs)
    sigs = np.asarray(
        minhash_signatures(
            enc.ascii, enc.lengths, k=k, n_hash=n_hash, seed=7
        )
    )
    ref = oracle.minhash_signatures(seqs, k, n_hash, seed=7)
    np.testing.assert_array_equal(sigs, ref)


def test_signatures_chunked_equal_unchunked(make_seqs):
    seqs = make_seqs(70, 8, 30)
    enc = encode.encode(seqs)
    a = np.asarray(
        minhash_signatures(enc.ascii, enc.lengths, k=3, n_hash=16, chunk=16)
    )
    b = np.asarray(
        minhash_signatures(enc.ascii, enc.lengths, k=3, n_hash=16, chunk=512)
    )
    np.testing.assert_array_equal(a, b)


def test_too_short_sequence_keeps_max_signature():
    # reference edge case: len(seq) < k => all-UINT32_MAX signature =>
    # similarity 1.0 with any other too-short sequence (SURVEY.md §2 #8)
    seqs = ["AR", "ND", "ARNDCQEG"]
    enc = encode.encode(seqs)
    sigs = np.asarray(
        minhash_signatures(enc.ascii, enc.lengths, k=4, n_hash=10, seed=0)
    )
    assert (sigs[0] == np.uint32(0xFFFFFFFF)).all()
    assert (sigs[1] == np.uint32(0xFFFFFFFF)).all()
    assert not (sigs[2] == np.uint32(0xFFFFFFFF)).all()
    sim = np.asarray(signature_similarity(sigs))
    assert sim[0, 1] == 1.0


def test_full_similarity_matches_oracle(make_seqs):
    seqs = make_seqs(40, 6, 50)
    enc = encode.encode(seqs)
    sigs = minhash_signatures(enc.ascii, enc.lengths, k=3, n_hash=32, seed=3)
    sim = np.asarray(signature_similarity(sigs), dtype=np.float64)
    ref = oracle.minhash_similarity(seqs, k=3, n_hash=32, seed=3)
    np.testing.assert_allclose(sim, ref, atol=1e-7)
    # exact symmetric, unit diagonal
    np.testing.assert_array_equal(sim, sim.T)
    np.testing.assert_array_equal(np.diag(sim), np.ones(len(seqs)))


def test_similarity_padding_blocks(make_seqs):
    # N not a multiple of the block size must not perturb results
    seqs = make_seqs(13, 6, 20)
    enc = encode.encode(seqs)
    sigs = minhash_signatures(enc.ascii, enc.lengths, k=2, n_hash=8, seed=1)
    a = np.asarray(signature_similarity(sigs, block=8))
    b = np.asarray(signature_similarity(sigs, block=256))
    np.testing.assert_array_equal(a, b)


def test_validation_errors():
    enc = encode.encode(["ARND"])
    with pytest.raises(ValueError):
        minhash_signatures(enc.ascii, enc.lengths, k=0)
    with pytest.raises(ValueError):
        minhash_signatures(enc.ascii, enc.lengths, k=2, n_hash=0)
