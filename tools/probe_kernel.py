"""Marginal-rate + bit-exactness probe for the Pallas NW kernel at the
driver's real padding ((m+1) % 8 == 0, i.e. mp1=568 for h3n2).

Methodology per docs/PERF.md: block_until_ready does not synchronize
under the axon relay, so we time K back-to-back kernel calls ending in
one host fetch and difference two K values to cancel fixed
dispatch/fetch overhead.  Knobs come from the environment so one process
probes one compiled configuration:

  DYNAALIGN_NW_BAND_CLASSES (default 6)   DYNAALIGN_NW_DIAGS (default 2)
  DYNAALIGN_NW_BAND / DYNAALIGN_NW_I16 as usual

DYNAALIGN_NW_DEBUG (stage ablation: "noscore" | "nostat") is read HERE
and passed as an explicit `debug=` argument — it is part of the jit
cache key, so flipping it between calls is safe, but results under any
non-empty value are intentionally WRONG (oracle check auto-skipped).
Production drivers never set it.

Usage: python tools/probe_kernel.py [B] [LEN] [--no-oracle]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 566
DEBUG = os.environ.get("DYNAALIGN_NW_DEBUG", "")
VARIANT = os.environ.get("DYNAALIGN_NW_VARIANT", "r5")
CHECK_ORACLE = "--no-oracle" not in sys.argv and not DEBUG


def main():
    from dynaalign_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from dynaalign_tpu import blosum, encode, oracle
    from dynaalign_tpu.ops import nw_i16_ok
    from dynaalign_tpu.ops.nw_pallas import (
        PALLAS_MAX_MP1,
        nw_similarity_batch_pallas,
        nw_similarity_batch_pallas_xl,
    )

    rng = np.random.default_rng(0)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    seqs = ["".join(rng.choice(aas, size=LEN)) for _ in range(2 * B)]
    pad_to = -(-(LEN + 1) // 8) * 8 - 1  # driver padding (api.py)
    enc = encode.encode(seqs, pad_to=pad_to)
    sub_np = blosum.get_matrix("BLOSUM62")
    sub = jnp.asarray(sub_np)
    a_idx = jnp.asarray(enc.indices[:B])
    a_len = jnp.asarray(enc.lengths[:B])
    b_idx = jnp.asarray(enc.indices[B:])
    b_len = jnp.asarray(enc.lengths[B:])
    i16 = nw_i16_ok(pad_to, pad_to, 10, 4, sub_np)
    print(
        f"B={B} LEN={LEN} mp1={pad_to + 1} i16={i16} "
        f"classes={os.environ.get('DYNAALIGN_NW_BAND_CLASSES', '10')} "
        f"nd={os.environ.get('DYNAALIGN_NW_DIAGS', '2')} "
        f"variant={VARIANT} debug={DEBUG or '-'}",
        flush=True,
    )

    # absorb the per-process relay warmup before timing anything
    np.asarray(jnp.zeros(4) + 1)

    xl = pad_to + 1 > PALLAS_MAX_MP1
    if xl:
        print("xl regime (pairs-on-sublanes transposed kernel)",
              flush=True)

    def run_k(k):
        outs = []
        t0 = time.perf_counter()
        for _ in range(k):
            if xl:
                outs.append(nw_similarity_batch_pallas_xl(
                    a_idx, a_len, b_idx, b_len, sub,
                ))
            else:
                outs.append(
                    nw_similarity_batch_pallas(
                        a_idx, a_len, b_idx, b_len, sub, score_i16=i16,
                        variant=VARIANT, debug=DEBUG,
                    )
                )
        m = np.asarray(outs[-1].matches)
        ln = np.asarray(outs[-1].length)
        return time.perf_counter() - t0, m, ln

    t_c, _, _ = run_k(1)  # compile
    print(f"first call (compile+run): {t_c:.1f} s", flush=True)
    # wide K spread so the differenced device time (~40 calls) dwarfs
    # relay latency jitter (tens of ms); median-of-reps resists load
    # spikes, min catches the quiet-window rate
    ests = []
    m = ln = None
    for _ in range(5):
        t_small, m, ln = run_k(4)
        t_big, _, _ = run_k(44)
        ests.append((t_big - t_small) / 40)
        print(f"  rep: per-call {ests[-1] * 1e3:.2f} ms", flush=True)
    best = min(ests)
    med = float(np.median(ests))
    cells = float(LEN) * LEN * B
    for name, val in (("min", best), ("median", med)):
        print(
            f"marginal ({name}): {val * 1e3:.2f} ms/call = "
            f"{B / val:,.0f} pairs/s = "
            f"{cells / val / 1e9:.1f}e9 cell-updates/s (real cells)",
            flush=True,
        )
    if CHECK_ORACLE:
        sims = m.astype(np.float64) / ln
        want = np.array(
            [
                oracle.nw_pair(seqs[i], seqs[B + i], "BLOSUM62", 10, 4)
                for i in range(min(B, 32))
            ]
        )
        ok = bool(np.array_equal(sims[: len(want)], want))
        print(f"bit-exact vs oracle (first {len(want)}): {ok}", flush=True)
        if not ok:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
