"""Compare long-layout ([B, Mp1], pairs on sublanes) vs short-layout
([Mp1, B], pairs on lanes) Pallas NW kernels on LONG (~566 aa) data.

The short layout turns the per-diagonal ancestor shift into a sublane
roll (cheap on TPU) instead of a lane roll; if rolls dominate the
per-step time this should show up directly.

Usage: python tools/probe_layout.py [B] [LEN]
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


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynaalign_tpu import blosum, encode
    from dynaalign_tpu.ops.nw_pallas import (
        nw_similarity_batch_pallas,
        nw_similarity_batch_pallas_short,
    )

    rng = np.random.default_rng(0)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    seqs = ["".join(rng.choice(aas, size=LEN)) for _ in range(2 * B)]
    # long layout wants (m+1)%128==0; short wants (m+1)%8==0 — use the
    # long padding so both kernels see identical shapes
    pad_to = -(-(LEN + 1) // 128) * 128 - 1
    enc = encode.encode(seqs, pad_to=pad_to)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    a_idx = jnp.asarray(enc.indices[:B])
    a_len = jnp.asarray(enc.lengths[:B])
    b_idx = jnp.asarray(enc.indices[B:])
    b_len = jnp.asarray(enc.lengths[B:])

    def run_k(fn, k):
        outs = []
        t0 = time.perf_counter()
        for _ in range(k):
            outs.append(fn(a_idx, a_len, b_idx, b_len, sub))
        m = np.asarray(outs[-1].matches)
        return time.perf_counter() - t0, m

    results = {}
    for name, fn in (
        ("long", nw_similarity_batch_pallas),
        ("short", nw_similarity_batch_pallas_short),
    ):
        run_k(fn, 1)  # compile
        t2, _ = run_k(fn, 2)
        t10, m = run_k(fn, 10)
        t2b, _ = run_k(fn, 2)
        t10b, _ = run_k(fn, 10)
        per_call = (min(t10, t10b) - min(t2, t2b)) / 8
        results[name] = (per_call, m)
        print(
            f"{name}: per-call {per_call*1e3:.2f} ms, "
            f"{B/per_call:.0f} pairs/s marginal", flush=True
        )
    ok = np.array_equal(results["long"][1], results["short"][1])
    print(f"bit-identical long vs short layout: {ok}")


if __name__ == "__main__":
    main()
