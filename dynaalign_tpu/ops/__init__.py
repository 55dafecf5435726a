from .murmur3 import murmur3_kmer_hashes  # noqa: F401
from .minhash import (  # noqa: F401
    minhash_signatures,
    signature_similarity,
)
from .nw import nw_similarity_batch  # noqa: F401
from .nw_pallas import nw_similarity_batch_pallas  # noqa: F401


def tpu_available() -> bool:
    """True when running on a real TPU backend (incl. the axon plugin)."""
    import jax

    try:
        plat = jax.devices()[0].platform
    except Exception:
        return False
    return plat in ("tpu", "axon") or "TPU" in str(jax.devices()[0])


def pick_nw_backend(
    m: int, n: int, backend: str = "auto"
) -> str:
    """Choose the NW kernel implementation for padded lengths (m, n).

    "pallas" requires a TPU backend, m+n under the packed-length budget,
    and lane-aligned m (the drivers pad so (m+1) % 128 == 0).  Everything
    else (CPU tests, very long sequences, tiny workloads) takes the XLA
    scan path, which is bit-identical.
    """
    if backend != "auto":
        return backend
    if (
        tpu_available()
        and m + n < (1 << 13)
        and (m + 1) % 128 == 0
        and (n + 1) % 128 == 0
    ):
        return "pallas"
    return "scan"


def nw_batch(
    a_idx, a_len, b_idx, b_len, sub, *,
    gap_open: int = 10, gap_ext: int = 4,
    backend: str = "auto", interpret: bool = False,
):
    """Backend-dispatched batched NW (matches, length)."""
    chosen = pick_nw_backend(a_idx.shape[1], b_idx.shape[1], backend)
    if chosen == "pallas":
        return nw_similarity_batch_pallas(
            a_idx, a_len, b_idx, b_len, sub,
            gap_open=gap_open, gap_ext=gap_ext, interpret=interpret,
        )
    return nw_similarity_batch(
        a_idx, a_len, b_idx, b_len, sub,
        gap_open=gap_open, gap_ext=gap_ext,
    )
