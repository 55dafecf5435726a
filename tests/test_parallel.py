"""Mesh-sharded all-pairs paths vs single-device results (8 virtual CPUs)."""

import jax
import numpy as np
import pytest

from dynaalign_tpu import blosum, encode, oracle
from dynaalign_tpu.ops.minhash import minhash_signatures
from dynaalign_tpu.parallel import (
    make_mesh,
    sharded_minhash_similarity,
    sharded_nw_allpairs,
    sharded_signature_agreement,
)


def test_mesh_shape():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.devices.size == 8  # conftest forces 8 virtual devices
    assert mesh.shape["rows"] * mesh.shape["cols"] == 8


@pytest.mark.parametrize("n", [16, 37])
def test_sharded_agreement_matches_local(n, make_seqs):
    seqs = make_seqs(n, 8, 30)
    enc = encode.encode(seqs)
    sigs = np.asarray(
        minhash_signatures(enc.ascii, enc.lengths, k=3, n_hash=16, seed=5)
    )
    counts = sharded_signature_agreement(sigs)
    local = (sigs[:, None, :] == sigs[None, :, :]).sum(-1)
    np.testing.assert_array_equal(counts, local)


def test_sharded_minhash_matches_oracle(make_seqs):
    seqs = make_seqs(30, 8, 40)
    enc = encode.encode(seqs)
    sims = sharded_minhash_similarity(
        enc.ascii, enc.lengths, k=3, n_hash=32, seed=9
    )
    ref = oracle.minhash_similarity(seqs, k=3, n_hash=32, seed=9)
    np.testing.assert_array_equal(sims, ref)


def test_sharded_nw_matches_oracle(make_seqs):
    seqs = make_seqs(25, 5, 40)
    enc = encode.encode(seqs)
    sub = blosum.get_matrix("BLOSUM62")
    sims = sharded_nw_allpairs(enc.indices, enc.lengths, sub, tile=8)
    ref = oracle.nw_similarity(seqs)
    np.testing.assert_array_equal(sims, ref)


def test_sharded_nw_multi_segment_dispatch(make_seqs):
    """max_tiles_per_dispatch splits the sweep into several
    identically-shaped XLA programs (the load-robust fused driver's
    chunking for full-set runs); every segmentation must be bit-exact
    vs the serial oracle."""
    seqs = make_seqs(41, 5, 40)
    enc = encode.encode(seqs)
    sub = blosum.get_matrix("BLOSUM62")
    ref = oracle.nw_similarity(seqs)
    # tile=8 -> 6x7/2 = 21 tiles; force 2- and 3-segment splits (the
    # quantum is ndev*group = 16 with 8 devices, so cap=16 gives
    # seg=16 -> 2 dispatches; cap=8 floors at one quantum)
    for cap in (16, 8):
        sims = sharded_nw_allpairs(
            enc.indices, enc.lengths, sub, tile=8,
            max_tiles_per_dispatch=cap,
        )
        np.testing.assert_array_equal(sims, ref)


def test_sharded_nw_small_mesh(make_seqs):
    # a 2-device sub-mesh must give identical results
    seqs = make_seqs(10, 5, 20)
    enc = encode.encode(seqs)
    sub = blosum.get_matrix("BLOSUM62")
    mesh = make_mesh(n_devices=2)
    sims = sharded_nw_allpairs(
        enc.indices, enc.lengths, sub, tile=4, mesh=mesh
    )
    ref = oracle.nw_similarity(seqs)
    np.testing.assert_array_equal(sims, ref)


def test_sharded_nw_bucketed_mixed_lengths(make_seqs):
    """Bucketed + sharded composition (SURVEY §7 hard part 6): mixed
    12-mer / long-protein panels must stay bit-exact while every pair
    group runs at its own bucket-pair padded shape."""
    from dynaalign_tpu import blosum, oracle
    from dynaalign_tpu.parallel import sharded_nw_allpairs_bucketed

    short = make_seqs(14, 10, 14)
    long_ = make_seqs(9, 50, 90)
    seqs = [s for pair in zip(short, long_ + long_[:5]) for s in pair]
    got = sharded_nw_allpairs_bucketed(
        seqs, blosum.get_matrix("BLOSUM62"),
        bucket_edges=(15, 31, 63, 127), batch=32,
    )
    want = oracle.nw_similarity(seqs)
    np.testing.assert_array_equal(got, want)


def test_sharded_nw_bucketed_single_bucket(make_seqs):
    from dynaalign_tpu import blosum, oracle
    from dynaalign_tpu.parallel import sharded_nw_allpairs_bucketed

    seqs = make_seqs(10, 20, 30)
    got = sharded_nw_allpairs_bucketed(
        seqs, blosum.get_matrix("BLOSUM62"), batch=16
    )
    np.testing.assert_array_equal(got, oracle.nw_similarity(seqs))


def test_sharded_nw_vmem_retry(make_seqs, monkeypatch):
    """A scoped-VMEM compile failure (terminal-dependent on the relay
    pool) must transparently retry the sweep with a forced lane-batch
    split and still return oracle-exact results."""
    import warnings

    from dynaalign_tpu.parallel import allpairs as ap

    real = ap._nw_tiles_sharded
    calls = []

    def flaky(*args, **kwargs):
        calls.append(kwargs.get("min_split"))
        if kwargs.get("min_split") == 1:
            raise jax.errors.JaxRuntimeError(
                "INTERNAL: Scoped allocation ... exceeded scoped vmem "
                "limit"
            )
        return real(*args, **kwargs)

    monkeypatch.setattr(ap, "_nw_tiles_sharded", flaky)
    seqs = make_seqs(20, 5, 30)
    enc = encode.encode(seqs)
    sub = blosum.get_matrix("BLOSUM62")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sims = ap.sharded_nw_allpairs(enc.indices, enc.lengths, sub, tile=8)
    assert any("scoped-VMEM" in str(x.message) for x in w)
    assert 1 in calls and 2 in calls
    np.testing.assert_array_equal(sims, oracle.nw_similarity(seqs))


def test_sharded_nw_vmem_retry_non_vmem_error_propagates(monkeypatch):
    from dynaalign_tpu.parallel import allpairs as ap

    def broken(*args, **kwargs):
        raise jax.errors.JaxRuntimeError("INTERNAL: something else")

    monkeypatch.setattr(ap, "_nw_tiles_sharded", broken)
    enc = encode.encode(["ARNDA", "ARNDC"])
    sub = blosum.get_matrix("BLOSUM62")
    with pytest.raises(jax.errors.JaxRuntimeError, match="something else"):
        ap.sharded_nw_allpairs(enc.indices, enc.lengths, sub, tile=2)


def test_sharded_minhash_topk_matches_single_device():
    """The mesh-sharded top-k driver is byte-identical to the
    single-device ops.topk_graph.minhash_topk (same f32 top_k, same
    self-mask, same phantom cleanup), at sizes that exercise padding
    (n not a multiple of ndev*block) and both count dtypes."""
    import numpy as np

    from dynaalign_tpu.ops.topk_graph import minhash_topk
    from dynaalign_tpu.parallel import make_mesh, sharded_minhash_topk

    rng = np.random.default_rng(8)
    for n, h, k in ((300, 50, 16), (513, 200, 33)):
        # clustered signatures so top-k has real structure + ties
        base = rng.integers(0, 1 << 31, size=(20, h), dtype=np.uint32)
        sigs = base[rng.integers(0, 20, size=n)]
        mut = rng.random((n, h)) < 0.1
        sigs = np.where(
            mut, rng.integers(0, 1 << 31, size=(n, h)), sigs
        ).astype(np.uint32)
        want_v, want_i = minhash_topk(sigs, k=k)
        got_v, got_i = sharded_minhash_topk(sigs, k=k, mesh=make_mesh())
        np.testing.assert_array_equal(got_i, want_i)
        np.testing.assert_array_equal(got_v, want_v)
