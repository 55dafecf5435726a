"""Flagship pipeline: hybrid similarity, clusterbreak checkpointing,
end-to-end runs on real bundled data (small subsets for CI speed)."""

import numpy as np
import pytest

from dynaalign_tpu import oracle
from dynaalign_tpu.config import (
    ClusterBreakConfig,
    MinHashConfig,
    PipelineConfig,
)
from dynaalign_tpu.cluster import clusterbreak
from dynaalign_tpu.io.datasets import load_sequences
from dynaalign_tpu.models import Pipeline, similarity_hybrid, nw_rescore_pairs


def test_nw_rescore_pairs_matches_oracle(make_seqs):
    seqs = make_seqs(20, 5, 40)
    pi = np.array([0, 1, 2, 5, 7], dtype=np.int64)
    pj = np.array([3, 4, 9, 11, 19], dtype=np.int64)
    got = nw_rescore_pairs(seqs, pi, pj, batch=4)
    want = np.array(
        [oracle.nw_pair(seqs[i], seqs[j]) for i, j in zip(pi, pj)]
    )
    np.testing.assert_array_equal(got, want)


def test_hybrid_similarity(rng):
    seqs = _family_seqs(rng, n_families=3, per=8, length=18)
    n = len(seqs)
    sim = similarity_hybrid(seqs, k=2, n_hash=64, prefilter_quantile=0.8)
    assert sim.shape == (n, n)
    np.testing.assert_array_equal(np.diag(sim), np.ones(n))
    np.testing.assert_array_equal(sim, sim.T)
    # surviving entries must equal exact NW values
    full_nw = oracle.nw_similarity(seqs)
    nz = (sim > 0) & ~np.eye(n, dtype=bool)
    assert nz.any()
    np.testing.assert_array_equal(sim[nz], full_nw[nz])
    # the 0.8-quantile prefilter prunes most cross-family pairs
    iu = np.triu_indices(n, k=1)
    assert (sim[iu] == 0).mean() >= 0.5


def _family_seqs(rng, n_families=3, per=10, length=14, nmut=2):
    aas = list("ARNDCQEGHILKMFPSTWYV")
    bases = ["".join(rng.choice(aas, size=length)) for _ in range(n_families)]
    out = []
    for b in bases:
        for _ in range(per):
            s = list(b)
            for _ in range(nmut):
                s[rng.integers(length)] = aas[rng.integers(20)]
            out.append("".join(s))
    return out


def test_pipeline_end_to_end(rng):
    seqs = _family_seqs(rng)
    cfg = PipelineConfig(
        minhash=MinHashConfig(k=2, n_hash=64),
        clusterbreak=ClusterBreakConfig(
            thresh_p=0.6, size_max=15, size_min=2
        ),
    )
    result = Pipeline(cfg).run(seqs)
    assert result.clusters.converged
    labeled = result.clusters.clustered_seq
    assert len(labeled) + len(result.clusters.filtered_seq) == len(seqs)
    assert result.consensus.shape[1] == 2
    assert len(result.consensus) == len(set(labeled[:, 1]))
    # consensus sequences are ungapped peptides of plausible length
    for _, cons in result.consensus:
        assert 5 <= len(cons.replace("-", "")) <= 20


def test_pipeline_hybrid_engine(rng):
    seqs = _family_seqs(rng, n_families=2, per=8)
    cfg = PipelineConfig(
        similarity="hybrid",
        minhash=MinHashConfig(k=2, n_hash=64),
        clusterbreak=ClusterBreakConfig(
            thresh_p=0.5, size_max=12, size_min=2
        ),
    )
    result = Pipeline(cfg).run(seqs)
    assert len(result.clusters.clustered_seq) > 0


def test_clusterbreak_checkpoint_resume(tmp_path, rng):
    # families of 14 > size_max=10 force one recursion per family, so the
    # run spans ~5 worklist subsets and can be interrupted mid-flight
    seqs = _family_seqs(rng, n_families=4, per=14)
    ckpt = str(tmp_path / "cb.ckpt")

    calls = {"n": 0}

    def sim_fn(x):
        calls["n"] += 1
        from dynaalign_tpu.api import similarity_mh

        return similarity_mh(x, k=2, n_hash=64, seed=0)

    full = clusterbreak(
        seqs, thresh_p=0.8, size_max=10, size_min=2, verbose=False,
        sim_fn=sim_fn,
    )

    # interrupt after the first few subsets, then resume from checkpoint
    budget = {"left": 2}

    def flaky_sim(x):
        if budget["left"] == 0:
            raise KeyboardInterrupt
        budget["left"] -= 1
        return sim_fn(x)

    with pytest.raises(KeyboardInterrupt):
        clusterbreak(
            seqs, thresh_p=0.8, size_max=10, size_min=2, verbose=False,
            sim_fn=flaky_sim, checkpoint_path=ckpt, checkpoint_every=1,
        )
    resumed = clusterbreak(
        seqs, thresh_p=0.8, size_max=10, size_min=2, verbose=False,
        sim_fn=sim_fn, checkpoint_path=ckpt,
    )
    # identical final output despite the interruption
    np.testing.assert_array_equal(
        np.asarray(resumed.clustered_seq), np.asarray(full.clustered_seq)
    )
    assert resumed.filtered_seq == full.filtered_seq
    import os

    assert not os.path.exists(ckpt)  # cleared on success


def test_clusterbreak_checkpoint_mismatch(tmp_path, rng):
    seqs = _family_seqs(rng, n_families=2, per=6)
    ckpt = str(tmp_path / "cb.ckpt")

    def boom(x):
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        clusterbreak(
            seqs, size_max=10, size_min=2, verbose=False,
            sim_fn=lambda x: (_ for _ in ()).throw(KeyboardInterrupt()),
            checkpoint_path=ckpt, checkpoint_every=1,
        )
    # no checkpoint written yet -> resume with different input is fine;
    # write one, then mismatched input must be rejected
    import os

    if os.path.exists(ckpt):
        with pytest.raises(ValueError, match="checkpoint"):
            clusterbreak(
                ["AAAA", "BBBB", "CCCC", "DDDD"], size_max=10, size_min=2,
                verbose=False, checkpoint_path=ckpt,
            )


def test_pipeline_on_real_peparray():
    # README quick-start config (MH k=2 n_hash=50 on evp_peparray probes),
    # on a subset for CI speed
    seqs = load_sequences("evp_peparray", limit=120)
    cfg = PipelineConfig(
        minhash=MinHashConfig(k=2, n_hash=50),
        clusterbreak=ClusterBreakConfig(
            thresh_p=0.8, size_max=30, size_min=2, max_itr=50
        ),
    )
    result = Pipeline(cfg).run(seqs)
    labeled = result.clusters.clustered_seq
    assert len(labeled) + len(result.clusters.filtered_seq) == len(seqs)
