"""Measure both NW dispatch shapes in the CURRENT relay window.

Run opportunistically (especially when the relay is busy) to extend the
quiet/loaded evidence table in docs/PERF.md "Load windows": the fused
single-dispatch driver vs the per-tile direct driver at n=256, plus the
bare-kernel marginal as the window's load reference.

Usage: python tools/probe_load_windows.py [N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def main():
    from dynaalign_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from dynaalign_tpu import blosum, encode
    from dynaalign_tpu.api import similarity_nw
    from dynaalign_tpu.io.datasets import load_sequences
    from dynaalign_tpu.ops.nw_pallas import nw_similarity_batch_pallas

    seqs = load_sequences("h3n2sample", limit=N)
    n_pairs = N * (N + 1) // 2
    np.asarray(jnp.zeros(4) + 1)  # absorb per-process warmup

    # bare-kernel marginal = this window's load reference
    pad_to = -(-(max(len(s) for s in seqs) + 1) // 8) * 8 - 1
    enc = encode.encode(seqs[: 2 * 128], pad_to=pad_to)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    a = jnp.asarray(np.tile(enc.indices[:128], (2, 1)))
    la = jnp.asarray(np.tile(enc.lengths[:128], 2))

    def run_k(k):
        outs = []
        t0 = time.perf_counter()
        for _ in range(k):
            outs.append(
                nw_similarity_batch_pallas(a, la, a, la, sub, score_i16=True)
            )
        np.asarray(outs[-1].matches)
        return time.perf_counter() - t0

    run_k(1)
    marg = min((run_k(24) - run_k(4)) / 20 for _ in range(2))

    def best_of(fn, reps=3):
        best = float("inf")
        fn()
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_fused = best_of(lambda: similarity_nw(seqs))
    os.environ["DYNAALIGN_NW_FUSED"] = "0"
    try:
        t_direct = best_of(lambda: similarity_nw(seqs))
    finally:
        os.environ.pop("DYNAALIGN_NW_FUSED", None)
    print(
        f"window: kernel-marginal {marg * 1e3:.2f} ms/256-pair call | "
        f"fused {n_pairs / t_fused:,.0f} pairs/s | "
        f"direct {n_pairs / t_direct:,.0f} pairs/s | "
        f"fused/direct {t_direct / t_fused:.2f}x"
    )


if __name__ == "__main__":
    main()
