"""Measure the long-layout Pallas NW kernel with int16 vs int32 scratch.

Marginal-rate methodology from docs/PERF.md: under the axon relay,
block_until_ready does not synchronize, so we time K back-to-back kernel
calls ending in one host fetch and difference two K values to cancel the
fixed dispatch/fetch overhead.

Usage: python tools/probe_i16.py [B] [LEN]
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
    from dynaalign_tpu.ops.nw_pallas import nw_similarity_batch_pallas

    rng = np.random.default_rng(0)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    seqs = ["".join(rng.choice(aas, size=LEN)) for _ in range(2 * B)]
    pad_to = -(-(LEN + 1) // 128) * 128 - 1
    enc = encode.encode(seqs, pad_to=pad_to)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    a_idx = jnp.asarray(enc.indices[:B])
    a_len = jnp.asarray(enc.lengths[:B])
    b_idx = jnp.asarray(enc.indices[B:])
    b_len = jnp.asarray(enc.lengths[B:])

    def run_k(k, i16):
        outs = []
        t0 = time.perf_counter()
        for _ in range(k):
            r = nw_similarity_batch_pallas(
                a_idx, a_len, b_idx, b_len, sub, score_i16=i16
            )
            outs.append(r)
        # one fetch forces completion of the whole chain
        m = np.asarray(outs[-1].matches)
        return time.perf_counter() - t0, m

    results = {}
    for i16 in (False, True):
        run_k(1, i16)  # compile
        t2, m2 = run_k(2, i16)
        t10, m10 = run_k(10, i16)
        t2b, _ = run_k(2, i16)
        t10b, _ = run_k(10, i16)
        per_call = (min(t10, t10b) - min(t2, t2b)) / 8
        results[i16] = (per_call, m10)
        print(
            f"i16={i16}: per-call {per_call*1e3:.2f} ms, "
            f"{B/per_call:.0f} pairs/s marginal", flush=True
        )
    ok = np.array_equal(results[False][1], results[True][1])
    print(f"bit-identical i16 vs i32 on device: {ok}")


if __name__ == "__main__":
    main()
