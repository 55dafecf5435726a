"""Pure-R-pipeline twin: invariant tests mirroring the reference's testthat
suite (tests/testthat/test-minHash.R) plus the seeded/golden coverage the
reference lacks (SURVEY.md §4 implications (a)-(b))."""

import numpy as np
import pytest

from dynaalign_tpu.models import reference_r as ref


def test_shingle_basic():
    assert ref.shingle("ABCDEF", 3) == ["ABC", "BCD", "CDE", "DEF"]
    assert ref.shingle("ABCDEF", 6) == ["ABCDEF"]  # k == nchar edge
    assert len(ref.shingle("ABCDEF", 1)) == 6


def test_shingle_errors():
    with pytest.raises(ValueError, match="single character string"):
        ref.shingle(123, 3)
    with pytest.raises(ValueError, match="positive integer between"):
        ref.shingle("ABC", 0)
    with pytest.raises(ValueError, match="positive integer between"):
        ref.shingle("ABC", 4)


def test_create_vocab_sorted_unique():
    seqs = ["ACDEGHHIKLLL", "ACDEGHHIKLMN"]
    vocab = ref.create_vocab(seqs, 3)
    assert vocab == sorted(vocab)
    assert len(vocab) == len(set(vocab))
    assert all(len(v) == 3 for v in vocab)


def test_create_char_matrix():
    seqs = ["ACDEGHHIKLLL", "ACDEGHHIKLMN"]
    vocab = ref.create_vocab(seqs, 3)
    cm = ref.create_char_matrix(seqs, vocab, 3)
    assert cm.shape == (len(vocab), len(seqs))
    assert set(np.unique(cm)) <= {0, 1}
    # every shingle of seq j is marked
    for j, s in enumerate(seqs):
        for sh in ref.shingle(s, 3):
            assert cm[vocab.index(sh), j] == 1


def test_create_hash_parameters():
    params = ref.create_hash_parameters(10, 100, seed=0)
    assert len(params["a"]) == 10 and len(params["b"]) == 10
    assert params["a"].min() >= 1 and params["a"].max() <= 100
    assert params["b"].min() >= 0 and params["b"].max() <= 100
    with pytest.raises(ValueError):
        ref.create_hash_parameters(0, 100)
    with pytest.raises(ValueError):
        ref.create_hash_parameters(5, 1)


def test_apply_hash():
    vals = ref.apply_hash(np.arange(50), 7, 3, 100)
    assert vals.min() >= 0 and vals.max() < 100
    np.testing.assert_array_equal(
        vals, ref.apply_hash(np.arange(50), 7, 3, 100)
    )  # deterministic


def test_signature_matrix_dims():
    seqs = ["ACDEGHHIKLLL", "ACDEGHHIKLMN"]
    vocab = ref.create_vocab(seqs, 3)
    cm = ref.create_char_matrix(seqs, vocab, 3)
    params = ref.create_hash_parameters(10, len(vocab), seed=1)
    sig = ref.compute_signature_matrix(cm, params, len(vocab))
    assert sig.shape == (10, 2)
    assert np.isfinite(sig).all()


def test_distance_matrix_properties():
    sig = np.array(
        [[1, 1, 5], [2, 2, 6], [3, 4, 7]], dtype=float
    )  # handcrafted 3x3 signatures
    d = ref.compute_distance_matrix(sig)
    np.testing.assert_array_equal(d, d.T)
    np.testing.assert_array_equal(np.diag(d), np.zeros(3))
    assert (d >= 0).all() and (d <= 1).all()
    assert d[0, 1] == pytest.approx(1 / 3)  # two of three slots agree


def test_minhash_end_to_end():
    seqs = ["ACDEGHHIKLLL", "ACDEGHHIKLMN", "WWWWYYYYPPPP"]
    out = ref.minhash(seqs, k=3, n_hash=100, seed=0)
    assert set(out) == {
        "vocabulary", "char_matrix", "sig_matrix", "dist_matrix",
    }
    assert out["char_matrix"].shape == (len(out["vocabulary"]), 3)
    assert out["sig_matrix"].shape == (100, 3)
    assert out["dist_matrix"].shape == (3, 3)
    # similar pair must be closer than dissimilar pair
    d = out["dist_matrix"]
    assert d[0, 1] < d[0, 2]


def test_minhash_seeded_golden():
    # seeded determinism (absent from the reference's tests)
    seqs = ["ACDEGHHIKLLL", "ACDEGHHIKLMN"]
    a = ref.minhash(seqs, 3, 16, seed=42)["dist_matrix"]
    b = ref.minhash(seqs, 3, 16, seed=42)["dist_matrix"]
    np.testing.assert_array_equal(a, b)


def test_twin_agrees_with_tpu_kernel(make_seqs):
    """Cross-validation: the pure twin's (1 - dist) must correlate strongly
    with the murmur3 TPU kernel's similarity on the same data (the role the
    reference's workspace correlation study plays,
    workspace/troyWspc.Rmd:53-69)."""
    from dynaalign_tpu import similarity_mh

    seqs = make_seqs(30, 12, 30)
    twin = 1.0 - ref.minhash(seqs, k=2, n_hash=200, seed=0)["dist_matrix"]
    tpu = similarity_mh(seqs, k=2, n_hash=200, seed=0)
    iu = np.triu_indices(len(seqs), k=1)
    r = np.corrcoef(twin[iu], tpu[iu])[0, 1]
    assert r > 0.85
