from .murmur3 import murmur3_kmer_hashes  # noqa: F401
from .minhash import (  # noqa: F401
    minhash_signatures,
    signature_similarity,
)
from .nw import nw_similarity_batch  # noqa: F401
from .nw_pallas import (  # noqa: F401
    PALLAS_MAX_MP1,
    XL_MAX_MP1,
    nw_i16_ok,
    nw_similarity_batch_pallas,
    nw_similarity_batch_pallas_short,
    nw_similarity_batch_pallas_xl,
    nw_similarity_tiles_pallas,
)


def tpu_available() -> bool:
    """True when running on a real TPU backend (incl. the axon plugin)."""
    import jax

    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon") or "TPU" in str(jax.devices()[0])


def pick_nw_backend(
    m: int, n: int, backend: str = "auto", bsz: int | None = None
) -> str:
    """Choose the NW kernel implementation for padded lengths (m, n).

    Both Pallas names map to the same pairs-on-lanes kernel (sublane
    alignment (m+1) % 8 == 0; batch ideally a multiple of 128 lanes);
    they differ only in how callers size pair batches ("pallas_short"
    signals the peptide-scale regime, where much larger batches fit the
    VMEM cell budget).  Everything else (CPU tests, very long
    sequences) takes the XLA scan path, which is bit-identical.
    """
    if backend != "auto":
        return backend
    # round 5: the packed-stats length field auto-widens to 15 bits
    # (ops.nw_pallas._ln_bits), so a Pallas path serves padded m+n up
    # to 32767 — multi-kilobase pairs no longer drop to the ~40x-slower
    # scan backend.  The standard pairs-on-lanes layout carries its
    # VMEM-resident slab to mp1 = PALLAS_MAX_MP1; past that the
    # transposed xl layout (pairs on sublanes, self-padding — no
    # alignment preconditions) takes over to XL_MAX_MP1.
    if tpu_available() and m + n < (1 << 15):
        if (m + 1) % 8 == 0 and (bsz is None or bsz % 128 == 0):
            if m <= 127:
                return "pallas_short"
            if m + 1 <= PALLAS_MAX_MP1:
                return "pallas"
        if PALLAS_MAX_MP1 < m + 1 <= XL_MAX_MP1:
            return "pallas_xl"
    return "scan"


def nw_batch(
    a_idx, a_len, b_idx, b_len, sub, *,
    gap_open: int = 10, gap_ext: int = 4,
    backend: str = "auto", interpret: bool = False,
    score_i16: bool = False,
):
    """Backend-dispatched batched NW (matches, length).

    score_i16 (Pallas backends only) stores the DP score planes as
    int16 — callers must gate it with ops.nw_pallas.nw_i16_ok on the
    concrete gap params + substitution matrix.
    """
    chosen = pick_nw_backend(
        a_idx.shape[1], b_idx.shape[1], backend, bsz=a_idx.shape[0]
    )
    if chosen == "pallas_short":
        return nw_similarity_batch_pallas_short(
            a_idx, a_len, b_idx, b_len, sub,
            gap_open=gap_open, gap_ext=gap_ext, interpret=interpret,
            score_i16=score_i16,
        )
    if chosen == "pallas":
        return nw_similarity_batch_pallas(
            a_idx, a_len, b_idx, b_len, sub,
            gap_open=gap_open, gap_ext=gap_ext, interpret=interpret,
            score_i16=score_i16,
        )
    if chosen == "pallas_xl":
        # xl layout has no i16 mode (nw_i16_ok fails at these depths)
        return nw_similarity_batch_pallas_xl(
            a_idx, a_len, b_idx, b_len, sub,
            gap_open=gap_open, gap_ext=gap_ext, interpret=interpret,
        )
    return nw_similarity_batch(
        a_idx, a_len, b_idx, b_len, sub,
        gap_open=gap_open, gap_ext=gap_ext,
    )


def nw_batch_tiled(
    a_idx, a_len, b_idx, b_len, sub, *,
    gap_open: int = 10, gap_ext: int = 4,
    backend: str = "auto", interpret: bool = False,
    score_i16: bool = False, min_split: int = 1,
):
    """Batched NW over [T, B, L] tile stacks — one launch for all tiles.

    Dispatches to the tiled Pallas sweep on TPU (dispatch overhead paid
    once per call instead of once per tile); off-TPU, lax.map of the
    scan kernel over the tile axis (bit-identical, bounded memory).
    ``min_split`` forces at least that lane-batch split factor (drivers
    retry with 2/4 after a terminal-side scoped-VMEM compile failure).
    """
    chosen = pick_nw_backend(
        a_idx.shape[2], b_idx.shape[2], backend, bsz=a_idx.shape[1]
    )
    if chosen in ("pallas", "pallas_short"):
        return nw_similarity_tiles_pallas(
            a_idx, a_len, b_idx, b_len, sub,
            layout="short" if chosen == "pallas_short" else "long",
            gap_open=gap_open, gap_ext=gap_ext, interpret=interpret,
            score_i16=score_i16, min_split=min_split,
        )
    if chosen == "pallas_xl":
        import jax

        res = jax.lax.map(
            lambda args: tuple(nw_similarity_batch_pallas_xl(
                *args, sub, gap_open=gap_open, gap_ext=gap_ext,
                interpret=interpret,
            )),
            (a_idx, a_len, b_idx, b_len),
        )
        from .nw import NWResult

        return NWResult(matches=res[0], length=res[1])
    import jax

    res = jax.lax.map(
        lambda args: tuple(nw_similarity_batch(
            *args, sub, gap_open=gap_open, gap_ext=gap_ext
        )),
        (a_idx, a_len, b_idx, b_len),
    )
    from .nw import NWResult

    return NWResult(matches=res[0], length=res[1])
