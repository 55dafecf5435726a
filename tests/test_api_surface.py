"""Public API surface: every reference export has a working equivalent
reachable from the package root (NAMESPACE:3-19 lists 17 exports)."""

import numpy as np

import dynaalign_tpu as da


def test_reference_export_parity():
    # similarity kernels
    assert callable(da.similarity_mh)
    assert callable(da.similarity_nw)
    # clustering layer
    assert callable(da.clusterbreak)
    assert callable(da.netcluster)
    assert callable(da.louvain_mod)
    # consensus layer
    assert callable(da.cluster_consensus)
    assert callable(da.consensus_plot)
    # analysis layer
    assert callable(da.compute_similarity_stats)
    assert callable(da.plot_similarity_matrix)
    # pure-R twin (8 exports)
    from dynaalign_tpu.models import reference_r as r

    for fn in (
        r.shingle, r.create_vocab, r.create_char_matrix,
        r.create_hash_parameters, r.apply_hash,
        r.compute_signature_matrix, r.compute_distance_matrix, r.minhash,
    ):
        assert callable(fn)
    # TPU-native extensions
    assert callable(da.Pipeline)
    assert callable(da.similarity_hybrid)
    assert callable(da.cluster_large)


def test_quick_end_to_end_through_root():
    seqs = ["ARNDARND", "ARNDARNE", "WWWWYYYY", "WWWWYYYG"] * 3
    sim = da.similarity_mh(seqs, k=2, n_hash=32)
    stats = da.compute_similarity_stats(sim)
    assert 0.0 <= stats.mean_similarity <= 1.0
    member = da.netcluster(da.cluster.threshold_matrix(sim, 0.5))
    assert len(member) == len(seqs)
    res = da.minhash(seqs, 2, 16, seed=0)
    assert res["dist_matrix"].shape == (len(seqs), len(seqs))
