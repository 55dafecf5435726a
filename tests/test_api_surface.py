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


def test_similarity_nw_fused_routing_bit_exact(monkeypatch):
    """The default fused-dispatch route in similarity_nw (taken on TPU
    once the sweep exceeds _FUSED_LAUNCH_THRESHOLD tiles) must return
    exactly what the direct per-tile driver returns.  The branch needs
    tpu_available() == True, unreachable on the CPU mesh — fake it; the
    sharded driver then auto-picks the scan backend and stays
    bit-exact, covering the routing glue (shape/padding handoff, tile
    adjustment, env gate) in CI."""
    import numpy as np

    from dynaalign_tpu import api, oracle

    monkeypatch.setattr(api, "tpu_available", lambda: True)
    rng = np.random.default_rng(5)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    # > 127 aa forces the long regime; 97 seqs -> 7x16 blocks -> 28
    # tiles > threshold (24), so the fused branch fires
    seqs = [
        "".join(rng.choice(aas, size=int(n)))
        for n in rng.integers(128, 150, size=97)
    ]
    # (the direct DYNAALIGN_NW_FUSED=0 leg would force real Pallas on
    # the CPU backend and cannot run here; the fused route's sharded
    # driver re-picks scan internally and must equal the oracle)
    fused = api.similarity_nw(seqs, tile=16)
    np.testing.assert_array_equal(
        fused, oracle.nw_similarity(seqs, n_threads=0)
    )
    # odd tile: the fused route must not silently drop to a slower
    # backend on TPU; on CPU it still agrees with the oracle
    # 56 seqs at tile=8 -> 7x8 blocks -> 28 tiles, still > threshold
    fused_odd = api.similarity_nw(seqs[:56], tile=8)
    np.testing.assert_array_equal(
        fused_odd, oracle.nw_similarity(seqs[:56], n_threads=0)
    )
