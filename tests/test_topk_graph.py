"""Sparse top-k similarity graph path (large-N clustering)."""

import numpy as np
import pytest
from scipy import sparse as sp

from dynaalign_tpu import encode
from dynaalign_tpu.ops.minhash import (
    minhash_signatures,
    signature_agreement_counts,
)
from dynaalign_tpu.ops.topk_graph import (
    cluster_large,
    knn_graph,
    minhash_topk,
)


def test_topk_matches_dense(make_seqs):
    seqs = make_seqs(60, 10, 30)
    enc = encode.encode(seqs)
    sigs = minhash_signatures(enc.ascii, enc.lengths, k=2, n_hash=32, seed=1)
    vals, idx = minhash_topk(sigs, k=5)
    dense = np.asarray(signature_agreement_counts(sigs)) / 32.0
    np.fill_diagonal(dense, -1)
    for i in range(len(seqs)):
        want = np.sort(dense[i])[::-1][:5]
        want = np.where(want < 0, 0.0, want)
        got = np.sort(vals[i])[::-1]
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_topk_nonmultiple_block(make_seqs):
    seqs = make_seqs(37, 8, 20)
    enc = encode.encode(seqs)
    sigs = minhash_signatures(enc.ascii, enc.lengths, k=2, n_hash=16, seed=0)
    vals, idx = minhash_topk(sigs, k=4, block=16)
    assert vals.shape == (37, 4)
    assert idx.max() < 37  # no phantom padded neighbors


def test_knn_graph_symmetric():
    vals = np.array([[0.5, 0.2], [0.5, 0.0], [0.9, 0.0]])
    idx = np.array([[1, 2], [0, 0], [0, 0]])
    adj = knn_graph(vals, idx)
    assert (adj != adj.T).nnz == 0
    assert adj[0, 1] == 0.5 and adj[1, 0] == 0.5
    assert adj[2, 0] == 0.9  # one-directional edge symmetrized
    assert adj[0, 2] == 0.9


def test_cluster_large_families(rng):
    aas = list("ARNDCQEGHILKMFPSTWYV")
    bases = ["".join(rng.choice(aas, size=16)) for _ in range(4)]
    seqs = []
    labels = []
    for fi, b in enumerate(bases):
        for _ in range(25):
            s = list(b)
            for _ in range(2):
                s[rng.integers(16)] = aas[rng.integers(20)]
            seqs.append("".join(s))
            labels.append(fi)
    member = cluster_large(
        seqs, k=2, n_hash=64, top_k=30, thresh_p=0.5
    )
    assert member.shape == (len(seqs),)
    assert member.min() >= 1
    # most family pairs should co-cluster: simple purity check
    labels = np.array(labels)
    purity = 0
    for c in np.unique(member):
        in_c = labels[member == c]
        purity += np.bincount(in_c).max()
    assert purity / len(seqs) > 0.8


def test_cluster_large_timings(rng):
    aas = list("ARNDCQEGHILKMFPSTWYV")
    seqs = ["".join(rng.choice(aas, size=12)) for _ in range(40)]
    stage_s: dict = {}
    member = cluster_large(
        seqs, k=2, n_hash=32, top_k=10, thresh_p=0.5, timings=stage_s
    )
    assert member.shape == (40,)
    assert set(stage_s) == {"signatures", "topk", "graph", "louvain"}
    assert all(v >= 0 for v in stage_s.values())


def test_enable_persistent_cache(tmp_path):
    import jax

    from dynaalign_tpu.utils import enable_persistent_cache

    target = str(tmp_path / "cache")
    before = jax.config.jax_compilation_cache_dir
    try:
        used = enable_persistent_cache(target)
        assert used == target
        assert jax.config.jax_compilation_cache_dir == target
        import os

        assert os.path.isdir(target)
    finally:
        jax.config.update("jax_compilation_cache_dir", before)


def test_topk_f32_sort_exact_with_stable_ties(rng):
    """The float32 top_k must select exactly what a stable descending
    int sort would — including boundary ties (many equal counts around
    the k-th slot) and index tie-break order."""
    n, h, k = 96, 8, 7  # tiny h => heavy count collisions
    sigs = rng.integers(0, 3, size=(n, h)).astype(np.uint32)
    vals, idx = minhash_topk(sigs, k=k)
    counts = (sigs[:, None, :] == sigs[None, :, :]).sum(-1).astype(np.int64)
    np.fill_diagonal(counts, -1)
    for i in range(n):
        order = np.argsort(-counts[i], kind="stable")[:k]
        np.testing.assert_array_equal(idx[i], order)
        np.testing.assert_allclose(vals[i], np.maximum(counts[i][order], 0) / h)
