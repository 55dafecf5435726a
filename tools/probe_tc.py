"""A/B the tiles-per-launch (tc) choice for the all-pairs NW driver.

Times warm similarity_nw() calls at several DYNAALIGN_NW_TC values with
best-of-R to damp relay jitter.  Usage: python tools/probe_tc.py [NSEQ]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

NSEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TCS = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [1, 2, 4, 8, 11])]
REPS = 6


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynaalign_tpu import api
    from dynaalign_tpu.io.datasets import load_sequences

    seqs = load_sequences("h3n2sample", limit=NSEQ)
    n_pairs = NSEQ * (NSEQ + 1) // 2
    base = None
    for tc in TCS:
        os.environ["DYNAALIGN_NW_TC"] = str(tc)
        api.similarity_nw(seqs)  # compile + warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            api.similarity_nw(seqs)
            best = min(best, time.perf_counter() - t0)
        rate = n_pairs / best
        if base is None:
            base = rate
        print(
            f"tc={tc:3d}: {best*1e3:8.1f} ms  {rate:9.0f} pairs/s "
            f"({rate/base:.2f}x vs tc={TCS[0]})",
            flush=True,
        )


if __name__ == "__main__":
    main()
