"""Probe Pallas NW kernel: max feasible batch + marginal throughput.

Usage: python tools/probe_batch.py [B ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dynaalign_tpu.utils import enable_persistent_cache

enable_persistent_cache()

from dynaalign_tpu import blosum, encode
from dynaalign_tpu.io.datasets import load_sequences
from dynaalign_tpu.ops.nw_pallas import nw_similarity_batch_pallas


def main():
    bsizes = [int(x) for x in sys.argv[1:]] or [256, 400, 512]
    seqs = load_sequences("h3n2sample", limit=64)
    max_len = max(len(s) for s in seqs)
    # production padding (8-multiple sublanes, api.py long regime)
    pad_to = -(-(max_len + 1) // 8) * 8 - 1
    enc = encode.encode(seqs, pad_to=pad_to)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    idx = jnp.asarray(enc.indices)
    lens = jnp.asarray(enc.lengths)
    n = len(seqs)
    print(f"n={n} max_len={max_len} pad_to={pad_to}", flush=True)

    # golden from the scan backend on a small slice
    from dynaalign_tpu.ops.nw import nw_similarity_batch

    rng = np.random.default_rng(0)
    for B in bsizes:
        rows = jnp.asarray(rng.integers(0, n, B).astype(np.int32))
        cols = jnp.asarray(rng.integers(0, n, B).astype(np.int32))
        a, la = jnp.take(idx, rows, 0), jnp.take(lens, rows)
        b, lb = jnp.take(idx, cols, 0), jnp.take(lens, cols)
        try:
            t0 = time.perf_counter()
            res = nw_similarity_batch_pallas(a, la, b, lb, sub)
            mt = np.asarray(res.matches)
            compile_s = time.perf_counter() - t0
        except Exception as e:
            print(f"B={B}: FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        # timed: marginal cost via call-count scaling (relay-safe)
        def run(reps):
            outs = []
            for _ in range(reps):
                outs.append(nw_similarity_batch_pallas(a, la, b, lb, sub))
            return np.asarray(outs[-1].matches), np.asarray(outs[-1].length)

        run(1)
        t0 = time.perf_counter()
        run(2)
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter()
        mt2, ln2 = run(10)
        t10 = time.perf_counter() - t0
        marginal = (t10 - t2) / 8
        percall = t10 / 10
        print(
            f"B={B}: compile {compile_s:.1f}s  percall {percall*1e3:.1f}ms "
            f"marginal {marginal*1e3:.1f}ms  "
            f"marginal {B/marginal:.0f} pairs/s  e2e {B/percall:.0f} pairs/s",
            flush=True,
        )
        # correctness vs scan on first 32 pairs
        ref = nw_similarity_batch(a[:32], la[:32], b[:32], lb[:32], sub)
        ok = np.array_equal(np.asarray(ref.matches), mt2[:32]) and \
            np.array_equal(np.asarray(ref.length), ln2[:32])
        print(f"B={B}: bit-exact vs scan[32]: {ok}", flush=True)


if __name__ == "__main__":
    main()
