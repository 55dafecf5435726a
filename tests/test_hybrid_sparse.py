"""Sparse hybrid (MH top-k prefilter + exact NW edge rescoring) vs the
dense hybrid path.

With top_k >= N-1 and a shared absolute prefilter threshold, the sparse
path sees exactly the pairs the dense path keeps, so the rescored
matrices must be equal ELEMENTWISE (same NW results, same float64
division) and Louvain must produce identical memberships.
"""

import numpy as np
import pytest

from dynaalign_tpu.cluster.louvain import louvain
from dynaalign_tpu.models import (
    cluster_large_exact,
    hybrid_topk_edges,
    similarity_hybrid,
    similarity_hybrid_sparse,
)


@pytest.fixture(scope="module")
def peptides(request):
    rng = np.random.default_rng(11)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    # clustered 12-mers: 40 motifs with 1-2 point mutations each, so the
    # MH threshold keeps a meaningful edge set
    motifs = ["".join(rng.choice(aas, size=12)) for _ in range(40)]
    seqs = []
    for m in motifs:
        for _ in range(16):
            s = list(m)
            for _ in range(rng.integers(0, 3)):
                s[rng.integers(12)] = rng.choice(aas)
            seqs.append("".join(s))
    return seqs  # 640 sequences


THRESH = 0.25  # absolute MH similarity threshold shared by both paths


def test_sparse_equals_dense_matrix(peptides):
    n = len(peptides)
    dense = similarity_hybrid(
        peptides, k=2, n_hash=50, seed=0, prefilter_threshold=THRESH
    )
    sp = similarity_hybrid_sparse(
        peptides, k=2, n_hash=50, seed=0, top_k=n - 1,
        prefilter_threshold=THRESH,
    )
    # dense zeros sub-threshold pairs; sparse never stores them — but
    # note the dense path also keeps pairs whose MH estimate is 0 when
    # THRESH <= 0 (not the case here), so the supports agree
    np.testing.assert_array_equal(sp.toarray(), dense)


def test_sparse_equals_dense_clustering(peptides):
    n = len(peptides)
    dense = similarity_hybrid(
        peptides, k=2, n_hash=50, seed=0, prefilter_threshold=THRESH
    )
    mem_dense = louvain(dense, resolution=1.05, seed=0).membership
    mem_sparse = cluster_large_exact(
        peptides, k=2, n_hash=50, seed=0, top_k=n - 1,
        prefilter_threshold=THRESH, resolution=1.05, louvain_seed=0,
    )
    np.testing.assert_array_equal(mem_sparse, mem_dense + 1)


def test_topk_truncation_keeps_strongest(peptides):
    """With a small top_k the kept edge set is a subset of the dense
    keep set, and every kept edge's weight is >= the threshold."""
    pi, pj, w = hybrid_topk_edges(
        peptides, k=2, n_hash=50, seed=0, top_k=8,
        prefilter_threshold=THRESH,
    )
    assert np.all(pi < pj)
    assert np.all(w >= THRESH)
    n = len(peptides)
    pi_full, pj_full, _ = hybrid_topk_edges(
        peptides, k=2, n_hash=50, seed=0, top_k=n - 1,
        prefilter_threshold=THRESH,
    )
    full = set(zip(pi_full.tolist(), pj_full.tolist()))
    assert set(zip(pi.tolist(), pj.tolist())) <= full


def test_quantile_threshold_sparse_runs(peptides):
    """Quantile mode (the production default) produces a connected-ish
    graph and valid memberships at truncated top_k."""
    timings = {}
    mem = cluster_large_exact(
        peptides[:256], k=2, n_hash=50, seed=0, top_k=16,
        thresh_p=0.8, timings=timings,
    )
    assert mem.shape == (256,)
    assert mem.min() == 1
    assert timings["n_edges"] > 0
    assert {"edges", "rescore", "louvain"} <= set(timings)
