"""Integration tests on the bundled real datasets — promoting the
reference's workspace validation studies (correlation + ARI,
workspace/troyWspc.Rmd:41-189) into the test suite (SURVEY.md §4 (c))."""

import numpy as np
import pytest

from dynaalign_tpu import oracle, similarity_mh, similarity_nw
from dynaalign_tpu.cluster import clusterbreak
from dynaalign_tpu.io.datasets import load_dataset, load_sequences


def _ari(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    n = len(a)
    _, ia = np.unique(a, return_inverse=True)
    _, ib = np.unique(b, return_inverse=True)
    ct = np.zeros((ia.max() + 1, ib.max() + 1), dtype=np.int64)
    np.add.at(ct, (ia, ib), 1)
    comb = lambda x: x * (x - 1) / 2  # noqa: E731
    sum_ij = comb(ct).sum()
    sum_a = comb(ct.sum(1)).sum()
    sum_b = comb(ct.sum(0)).sum()
    exp = sum_a * sum_b / comb(n)
    mx = (sum_a + sum_b) / 2
    return (sum_ij - exp) / (mx - exp) if mx != exp else 1.0


def test_nw_bit_exact_on_h3n2_subset():
    # the BASELINE bit-exactness target, on a CI-sized subset
    seqs = load_sequences("h3n2sample", limit=12)
    np.testing.assert_array_equal(
        similarity_nw(seqs), oracle.nw_similarity(seqs)
    )


def test_mh_bit_exact_on_peparray():
    seqs = load_sequences("evp_peparray", limit=200)
    got = similarity_mh(seqs, k=2, n_hash=50, seed=0)
    want = oracle.minhash_similarity(seqs, k=2, n_hash=50, seed=0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "dataset,limit,k,n_hash,r_med,r_min",
    [
        # long regime: ~566 aa H3N2 HA proteins (troyWspc.Rmd:106-133)
        ("h3n2sample", 30, 4, 200, 0.60, 0.50),
        # short regime: 12-mer peptide-array probes (troyWspc.Rmd:41-95;
        # the reference used ~12 aa herpesvirus probes — stripped
        # upstream, peparray panels are the SURVEY §6 substitute).
        # 12-mers share few 4-mers unless related, so the correlation
        # is real but weaker — regime-appropriate thresholds.
        ("evp_peparray", 120, 4, 200, 0.30, 0.20),
        # the reference's clusterbreak DEFAULT config: similarityMH(k=2,
        # n_hash=50) (R/clusterbreak.R:185) — the quick-start path users
        # actually hit.  2-mers are shared heavily among related 12-mer
        # probes, so the default correlates BETTER here than k=4
        # (measured over 10 seeds: median 0.68, worst 0.62; thresholds
        # leave seed margin).
        ("evp_peparray", 120, 2, 50, 0.55, 0.45),
    ],
)
def test_mh_nw_correlation_two_regimes(
    dataset, limit, k, n_hash, r_med, r_min
):
    """MH similarity must correlate with exact NW in BOTH length regimes
    across >= 10 hash-family seeds (the reference's 50-replicate
    accuracy protocol, workspace/troyWspc.Rmd:41-133, promoted into the
    suite with regime-appropriate thresholds)."""
    seqs = load_sequences(dataset, limit=limit)
    nw = oracle.nw_similarity(seqs, n_threads=0)
    iu = np.triu_indices(len(seqs), k=1)
    rs = []
    for seed in range(10):
        mh = similarity_mh(seqs, k=k, n_hash=n_hash, seed=seed)
        rs.append(float(np.corrcoef(mh[iu], nw[iu])[0, 1]))
    rs = np.asarray(rs)
    assert np.median(rs) > r_med, f"median Pearson {np.median(rs):.3f}"
    assert rs.min() > r_min, f"worst-seed Pearson {rs.min():.3f}"


def test_mh_nw_mantel_long_sequences():
    """Mantel permutation test (troyWspc.Rmd:273-289): the MH/NW matrix
    correlation must be significant against the null of permuted
    sequence identities (joint row+column permutation)."""
    seqs = load_sequences("h3n2sample", limit=30)
    n = len(seqs)
    mh = similarity_mh(seqs, k=4, n_hash=200, seed=0)
    nw = oracle.nw_similarity(seqs, n_threads=0)
    iu = np.triu_indices(n, k=1)
    r_obs = np.corrcoef(mh[iu], nw[iu])[0, 1]
    rng = np.random.default_rng(0)
    n_perm = 499
    hits = 0
    for _ in range(n_perm):
        p = rng.permutation(n)
        r_p = np.corrcoef(mh[np.ix_(p, p)][iu], nw[iu])[0, 1]
        hits += r_p >= r_obs
    p_val = (hits + 1) / (n_perm + 1)
    assert p_val <= 0.01, f"Mantel p-value {p_val:.4f} (r_obs={r_obs:.3f})"


def test_consensus_column_agreement_h3n2():
    """Consensus parity evidence at h3n2 scale (VERDICT round-1 item 3):
    per-cluster consensi must agree per-column with the column-majority
    of the same MSA, and identical-sequence clusters must return the
    exact sequence (DECIPHER::ConsensusSequence behavior,
    R/clusterbreak.R:315-316)."""
    from dynaalign_tpu.consensus import (
        cluster_consensus,
        consensus_sequence,
        progressive_msa,
    )

    seqs = load_sequences("h3n2sample", limit=24)
    # identical-sequence cluster -> exact sequence
    same = [(seqs[0], "1")] * 5
    out = cluster_consensus(np.array(same, dtype=object))
    assert out[0, 1] == seqs[0]

    # real mixed cluster: consensus vs column-majority agreement
    aligned = progressive_msa(seqs[:12])
    cons = consensus_sequence(aligned)
    cols = np.array([list(s) for s in aligned])
    agree = 0
    informative = 0
    for c in range(cols.shape[1]):
        vals, counts = np.unique(cols[:, c], return_counts=True)
        maj = vals[np.argmax(counts)]
        informative += 1
        # ambiguity codes subsume their members; '+' counts as miss
        ok = cons[c] == maj or (
            cons[c] in "BZJX" and maj in "ARNDCQEGHILKMFPSTWYV"
        )
        agree += bool(ok)
    assert informative > 500  # HA proteins are ~566 aa
    frac = agree / informative
    assert frac >= 0.95, f"column agreement too low: {frac:.3f}"


def test_louvain_cross_validation_networkx():
    """Cross-validate the from-scratch Louvain against networkx's
    independent implementation on a thresholded real similarity matrix
    (SURVEY §7 hard part 4; VERDICT round-1 item 4): median ARI >= 0.8
    over seeds and modularity within 2% of the better of the two."""
    import networkx as nx
    from networkx.algorithms.community import louvain_communities

    from dynaalign_tpu.cluster import louvain
    from dynaalign_tpu.cluster.louvain import modularity as our_q
    from scipy import sparse

    seqs = load_sequences("evp_peparray", limit=150)
    sim = similarity_mh(seqs, k=2, n_hash=100, seed=0)
    thr = np.quantile(sim[np.triu_indices(len(seqs), k=1)], 0.8)
    adj = np.where(sim >= thr, sim, 0.0)
    np.fill_diagonal(adj, 0.0)

    g = nx.from_numpy_array(adj)
    aris = []
    q_ours_best = -1.0
    q_nx_best = -1.0
    for seed in range(5):
        ours = louvain(sparse.csr_matrix(adj), seed=seed).membership
        nx_comms = louvain_communities(g, weight="weight", seed=seed)
        nx_mem = np.zeros(len(seqs), dtype=np.int64)
        for cid, members in enumerate(nx_comms):
            for v in members:
                nx_mem[v] = cid
        aris.append(_ari(ours, nx_mem))
        q_ours_best = max(q_ours_best, our_q(sparse.csr_matrix(adj), ours))
        q_nx_best = max(
            q_nx_best, our_q(sparse.csr_matrix(adj), nx_mem)
        )
    med = float(np.median(aris))
    assert med >= 0.8, f"median ARI vs networkx too low: {med:.3f}"
    best = max(q_ours_best, q_nx_best)
    assert q_ours_best >= best - abs(best) * 0.02, (
        f"our modularity {q_ours_best:.4f} lags networkx {q_nx_best:.4f}"
    )


def test_clusterbreak_ari_vs_clades():
    """clusterbreak clusters must align with H3N2 clade labels
    (the reference's clustering-quality protocol,
    workspace/troyWspc.Rmd:134-189)."""
    cols = load_dataset("h3n2sample")
    rng = np.random.default_rng(0)
    # stratified sample over clades for a fast but non-trivial instance
    clades = np.asarray(cols["clade"])
    seqs_all = np.asarray(cols["sequence"])
    keep_idx = []
    for clade in np.unique(clades):
        idx = np.nonzero(clades == clade)[0]
        take = min(len(idx), 25)
        keep_idx.extend(rng.choice(idx, size=take, replace=False))
    keep_idx = np.array(sorted(keep_idx))
    seqs = [str(s) for s in seqs_all[keep_idx]]
    labels = clades[keep_idx]
    # dedupe (clusterbreak assumes distinct membership rows)
    seen = {}
    for s, lab in zip(seqs, labels):
        seen.setdefault(s, lab)
    seqs = list(seen)
    labels = np.array([seen[s] for s in seqs])

    result = clusterbreak(
        seqs, thresh_p=0.8, size_max=len(seqs), size_min=1,
        sim_fn=lambda x: similarity_mh(x, k=4, n_hash=300, seed=0),
        verbose=False,
    )
    assign = dict(zip(result.clustered_seq[:, 0], result.clustered_seq[:, 1]))
    got = np.array([assign.get(s, "none") for s in seqs])
    score = _ari(got, labels)
    assert score > 0.3, f"ARI vs clades too low: {score:.3f}"
