"""Pallas NW kernel (interpret mode off-TPU) vs the C++ oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from dynaalign_tpu import blosum, encode, oracle
from dynaalign_tpu.ops import pick_nw_backend
from dynaalign_tpu.ops.nw_pallas import (
    nw_similarity_batch_pallas,
    nw_similarity_batch_pallas_short,
)


def _run(pairs, matrix="BLOSUM62", go=10, ge=4, pad_to=None, kernel=None,
         **kw):
    a_seqs = [p[0] for p in pairs]
    b_seqs = [p[1] for p in pairs]
    ea = encode.encode(a_seqs, pad_to=pad_to)
    eb = encode.encode(b_seqs, pad_to=pad_to)
    sub = jnp.asarray(blosum.get_matrix(matrix))
    res = (kernel or nw_similarity_batch_pallas)(
        jnp.asarray(ea.indices), jnp.asarray(ea.lengths),
        jnp.asarray(eb.indices), jnp.asarray(eb.lengths),
        sub, gap_open=go, gap_ext=ge, interpret=True, **kw,
    )
    return res.similarity()


def _oracle(pairs, matrix="BLOSUM62", go=10, ge=4):
    return np.array(
        [oracle.nw_pair(a, b, matrix, go, ge) for a, b in pairs]
    )


def test_pallas_bit_exact_random(make_seqs):
    seqs = make_seqs(40, 1, 60, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:20], seqs[20:]))
    np.testing.assert_array_equal(_run(pairs), _oracle(pairs))


@pytest.mark.parametrize("variant", ["r4", "r5"])
@pytest.mark.parametrize("i16", [False, True])
def test_pallas_step_variants_bit_exact(variant, i16, make_seqs):
    """Both step bodies (round-4 and the round-5 roll-lean restructure)
    are bit-exact vs the oracle, with and without i16 storage, on a
    band-limited shape (pad_to 295 -> mp1 296 >= 256 turns the band
    window on)."""
    seqs = make_seqs(16, 200, 290, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:8], seqs[8:]))
    np.testing.assert_array_equal(
        _run(pairs, pad_to=295, variant=variant, score_i16=i16),
        _oracle(pairs),
    )


@pytest.mark.parametrize("gaps", [(5, 1), (12, 2)])
def test_pallas_gap_variants(gaps, make_seqs):
    go, ge = gaps
    seqs = make_seqs(16, 3, 40)
    pairs = list(zip(seqs[:8], seqs[8:]))
    np.testing.assert_array_equal(
        _run(pairs, go=go, ge=ge), _oracle(pairs, go=go, ge=ge)
    )


def test_pallas_lane_aligned_shapes(make_seqs):
    # the production tiling pads to (128k - 1); exercise that exact shape
    seqs = make_seqs(8, 100, 120)
    pairs = list(zip(seqs[:4], seqs[4:]))
    np.testing.assert_array_equal(
        _run(pairs, pad_to=127), _oracle(pairs)
    )


def test_packed_length_guard():
    # the 15-bit wide packing serves padded m+n < 32768; beyond that
    # the kernel must refuse (the dispatcher routes to scan first)
    e = encode.encode(["A" * 17000], pad_to=17000)
    with pytest.raises(ValueError, match="packed-length"):
        nw_similarity_batch_pallas(
            jnp.asarray(e.indices), jnp.asarray(e.lengths),
            jnp.asarray(e.indices), jnp.asarray(e.lengths),
            jnp.asarray(blosum.get_matrix()), interpret=True,
        )


def test_backend_dispatch():
    # CPU test env: auto must fall back to scan
    assert pick_nw_backend(127, 127, "auto") == "scan"
    assert pick_nw_backend(127, 127, "pallas") == "pallas"
    assert pick_nw_backend(639, 639, "scan") == "scan"
    assert pick_nw_backend(15, 15, "pallas_short") == "pallas_short"


def test_backend_dispatch_wide_lengths(monkeypatch):
    """Past the standard layout's VMEM ceiling (mp1 > PALLAS_MAX_MP1)
    the dispatcher routes to the transposed xl Pallas kernel up to
    padded m+n < 32768 (15-bit wide packing); only beyond that does it
    fall to scan.  tpu_available is faked — routing only."""
    import dynaalign_tpu.ops as ops

    monkeypatch.setattr(ops, "tpu_available", lambda: True)
    assert pick_nw_backend(1047, 1047, "auto", bsz=128) == "pallas"
    assert pick_nw_backend(5007, 5007, "auto", bsz=128) == "pallas_xl"
    # xl has no alignment preconditions (it pads internally)
    assert pick_nw_backend(5000, 5000, "auto", bsz=100) == "pallas_xl"
    assert pick_nw_backend(12007, 12007, "auto", bsz=128) == "pallas_xl"
    assert pick_nw_backend(16407, 16407, "auto", bsz=128) == "scan"


def test_xl_kernel_bit_exact(make_seqs):
    """The transposed xl kernel (pairs on sublanes) is bit-exact vs the
    oracle at odd batch sizes and unaligned lengths (interpret mode;
    the on-chip multi-kilobase run lives in tools/probe_kernel.py)."""
    from dynaalign_tpu.ops.nw_pallas import nw_similarity_batch_pallas_xl

    seqs = make_seqs(22, 20, 90, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:11], seqs[11:]))
    np.testing.assert_array_equal(
        _run(pairs, kernel=nw_similarity_batch_pallas_xl),
        _oracle(pairs),
    )
    np.testing.assert_array_equal(
        _run(pairs, go=12, ge=2, kernel=nw_similarity_batch_pallas_xl),
        _oracle(pairs, go=12, ge=2),
    )


def test_wide_packing_bit_exact(make_seqs):
    """Forced 15-bit length field at small sizes: identical results to
    the default 13-bit field and to the oracle (the packing width must
    not affect values, only capacity)."""
    seqs = make_seqs(16, 30, 60, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:8], seqs[8:]))
    np.testing.assert_array_equal(
        _run(pairs, ln_bits=15), _oracle(pairs)
    )
    np.testing.assert_array_equal(
        _run(pairs, ln_bits=15), _run(pairs)
    )


def test_wide_packing_auto_threshold(make_seqs):
    """Padded m+n >= 8192 auto-selects the wide field and stays bit
    exact vs the scan backend (band-limited, i16 ineligible at this
    depth).  One short true pair inside a deep padded grid keeps the
    interpret-mode sweep affordable while exercising the real
    wide-packing capture path."""
    from dynaalign_tpu.ops.nw import nw_similarity_batch

    seqs = make_seqs(2, 150, 200, alphabet=encode.ALPHABET)
    ea = encode.encode([seqs[0]], pad_to=4103)
    eb = encode.encode([seqs[1]], pad_to=4103)
    sub = jnp.asarray(blosum.get_matrix())
    res = nw_similarity_batch_pallas(
        jnp.asarray(ea.indices), jnp.asarray(ea.lengths),
        jnp.asarray(eb.indices), jnp.asarray(eb.lengths),
        sub, interpret=True,
    )
    want = nw_similarity_batch(
        jnp.asarray(ea.indices), jnp.asarray(ea.lengths),
        jnp.asarray(eb.indices), jnp.asarray(eb.lengths),
        sub,
    )
    np.testing.assert_array_equal(
        np.asarray(res.matches), np.asarray(want.matches)
    )
    np.testing.assert_array_equal(
        np.asarray(res.length), np.asarray(want.length)
    )


def test_pallas_short_bit_exact_random(make_seqs):
    # peptide-scale pairs on the transposed (pairs-on-lanes) layout
    seqs = make_seqs(64, 1, 15, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:32], seqs[32:]))
    np.testing.assert_array_equal(
        _run(pairs, pad_to=15, kernel=nw_similarity_batch_pallas_short),
        _oracle(pairs),
    )


@pytest.mark.parametrize("gaps", [(5, 1), (12, 2)])
def test_pallas_short_gap_variants(gaps, make_seqs):
    go, ge = gaps
    seqs = make_seqs(16, 3, 30)
    pairs = list(zip(seqs[:8], seqs[8:]))
    np.testing.assert_array_equal(
        _run(pairs, go=go, ge=ge, pad_to=31,
             kernel=nw_similarity_batch_pallas_short),
        _oracle(pairs, go=go, ge=ge),
    )


def test_i16_eligibility_gate(monkeypatch):
    from dynaalign_tpu.ops import nw_i16_ok

    sub = blosum.get_matrix("BLOSUM62")
    # qualified on-chip (round 2): on by default, env var is an opt-out
    monkeypatch.setenv("DYNAALIGN_NW_I16", "0")
    assert not nw_i16_ok(639, 639, 10, 4, sub)
    monkeypatch.delenv("DYNAALIGN_NW_I16")
    # h3n2-scale config with defaults: provably safe
    assert nw_i16_ok(639, 639, 10, 4, sub)
    # peptide-scale: safe
    assert nw_i16_ok(15, 15, 10, 4, sub)
    # huge padded lengths or giant gap penalties: not safe
    assert not nw_i16_ok(2047, 2047, 10, 4, sub)
    assert not nw_i16_ok(639, 639, 10_000, 4_000, sub)


@pytest.mark.parametrize("kernel_kind", ["long", "short"])
def test_pallas_i16_bit_exact(kernel_kind, make_seqs):
    # int16 score planes must match the int32 path bit-for-bit when the
    # eligibility gate passes
    kernel = (
        nw_similarity_batch_pallas
        if kernel_kind == "long"
        else nw_similarity_batch_pallas_short
    )
    seqs = make_seqs(48, 1, 60, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:24], seqs[24:]))
    ea = encode.encode([p[0] for p in pairs], pad_to=63)
    eb = encode.encode([p[1] for p in pairs], pad_to=63)
    sub = jnp.asarray(blosum.get_matrix())
    res = kernel(
        jnp.asarray(ea.indices), jnp.asarray(ea.lengths),
        jnp.asarray(eb.indices), jnp.asarray(eb.lengths),
        sub, interpret=True, score_i16=True,
    )
    np.testing.assert_array_equal(res.similarity(), _oracle(pairs))


def test_pallas_i16_gap_variants(make_seqs):
    seqs = make_seqs(16, 3, 40)
    pairs = list(zip(seqs[:8], seqs[8:]))
    ea = encode.encode([p[0] for p in pairs], pad_to=47)
    eb = encode.encode([p[1] for p in pairs], pad_to=47)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM100"))
    res = nw_similarity_batch_pallas(
        jnp.asarray(ea.indices), jnp.asarray(ea.lengths),
        jnp.asarray(eb.indices), jnp.asarray(eb.lengths),
        sub, gap_open=12, gap_ext=2, interpret=True, score_i16=True,
    )
    np.testing.assert_array_equal(
        res.similarity(),
        _oracle(pairs, matrix="BLOSUM100", go=12, ge=2),
    )


def test_pallas_short_asymmetric_buckets(make_seqs):
    # cross-bucket group shapes: short a-side against a longer b-side
    a = make_seqs(6, 2, 15)
    b = make_seqs(6, 40, 60)
    pairs = list(zip(a, b))
    ea = encode.encode(a, pad_to=15)
    eb = encode.encode(b, pad_to=63)
    sub = jnp.asarray(blosum.get_matrix())
    res = nw_similarity_batch_pallas_short(
        jnp.asarray(ea.indices), jnp.asarray(ea.lengths),
        jnp.asarray(eb.indices), jnp.asarray(eb.lengths),
        sub, interpret=True,
    )
    np.testing.assert_array_equal(res.similarity(), _oracle(pairs))


def test_band_limited_bit_exact(monkeypatch, make_seqs):
    """Band-limited sweep (static width classes + dynamic 32-aligned
    sublane window) must be bit-identical to the full-width kernel on
    square and asymmetric grids."""
    from dynaalign_tpu.ops.nw import nw_similarity_batch

    monkeypatch.setenv("DYNAALIGN_NW_BAND", "1")
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    a_seqs = make_seqs(8, 150, 287)
    b_seqs = make_seqs(8, 30, 159)
    ea = encode.encode(a_seqs, pad_to=287)
    eb = encode.encode(b_seqs, pad_to=159)
    a, la = jnp.asarray(ea.indices), jnp.asarray(ea.lengths)
    b, lb = jnp.asarray(eb.indices), jnp.asarray(eb.lengths)
    for x, lx, y, ly in ((a, la, b, lb), (b, lb, a, la), (a, la, a, la)):
        got = nw_similarity_batch_pallas(
            x, lx, y, ly, sub, interpret=True
        )
        want = nw_similarity_batch(x, lx, y, ly, sub)
        np.testing.assert_array_equal(
            np.asarray(got.matches), np.asarray(want.matches)
        )
        np.testing.assert_array_equal(
            np.asarray(got.length), np.asarray(want.length)
        )


def test_band_classes_alignment():
    from dynaalign_tpu.ops.nw_pallas import _band_classes

    from dynaalign_tpu.ops.nw_pallas import _ALIGN

    for mp1 in (256, 568, 576, 1024, 2048):
        for n_classes in (4, 6, 8):
            classes = _band_classes(mp1, n_classes)
            assert classes[-1] == mp1
            assert all((mp1 - w) % _ALIGN == 0 for w in classes)
            assert sorted(classes) == list(classes)


def test_batch_split_vmem_budget():
    """Long batches split along the tile axis so mp1 * B stays within
    the measured scoped-VMEM stack budget (~85.5 B/cell, 16 MB limit)."""
    from dynaalign_tpu.ops.nw_pallas import _LONG_CELL_BUDGET, _batch_split

    assert _batch_split(568, 256) == 1  # the h3n2 headline shape fits
    assert _batch_split(888, 256) == 2  # full-set tail (~880 aa)
    assert _batch_split(1536, 256) == 4  # sub-128 lanes when forced
    assert _batch_split(4000, 256) == 8
    for mp1, b in ((568, 256), (888, 256), (1536, 256), (4000, 256)):
        f = _batch_split(mp1, b)
        assert (b // f) * mp1 <= _LONG_CELL_BUDGET or b // f == 1


def test_batch_split_bit_exact(monkeypatch, make_seqs):
    """The split path must be bit-identical to the unsplit kernel —
    force a split at CI scale by shrinking the budget."""
    from dynaalign_tpu.ops import nw_pallas as npx

    monkeypatch.setattr(npx, "_LONG_CELL_BUDGET", 300)
    assert npx._batch_split(72, 6) == 2
    seqs = make_seqs(12, 30, 60, alphabet=encode.ALPHABET)
    pairs = list(zip(seqs[:6], seqs[6:]))
    np.testing.assert_array_equal(
        _run(pairs, pad_to=71), _oracle(pairs)
    )
