"""Isolate per-launch overhead of the all-pairs NW dispatch loop.

Compares, on the real chip (marginal methodology, one fetch per chain):
  (a) K chained calls of the bare batched kernel, SAME input refs
  (b) K chained calls of the bare batched kernel, DIFFERENT inputs
  (c) K chained calls of the full bench-style tile fn (gather + repeat +
      tiled kernel), different pre-staged index tiles
  (d) same as (c) at a larger pair batch
Usage: python tools/probe_overhead.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K1, K2, REPS = 2, 10, 3


def marginal(fn_calls, sync, label, pairs_per_call):
    def window(k):
        t0 = time.perf_counter()
        out = None
        for i in range(k):
            out = fn_calls[i % len(fn_calls)]()
        sync(out)
        return time.perf_counter() - t0

    for _ in range(2):
        sync(fn_calls[0]())
        if len(fn_calls) > 1:
            sync(fn_calls[1]())
    t1 = min(window(K1) for _ in range(REPS))
    t2 = min(window(K2) for _ in range(REPS))
    per = (t2 - t1) / (K2 - K1)
    print(
        f"{label:48s} {per*1e3:7.2f} ms/call "
        f"({pairs_per_call/per:9.0f} pairs/s)",
        flush=True,
    )
    return per


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynaalign_tpu import api, blosum, encode
    from dynaalign_tpu.io.datasets import load_sequences
    from dynaalign_tpu.ops.nw_pallas import nw_similarity_batch_pallas

    seqs = load_sequences("h3n2sample", limit=128)
    max_len = max(len(s) for s in seqs)
    pad_to = -(-(max_len + 1) // 8) * 8 - 1
    enc = encode.encode(seqs, pad_to=pad_to)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    seq_idx = jnp.asarray(enc.indices)
    lengths = jnp.asarray(enc.lengths)
    n = enc.n
    rng = np.random.default_rng(0)

    def sync(x):
        if isinstance(x, tuple):
            x = x[0]
        np.asarray(jax.tree_util.tree_leaves(x)[0])

    # B=512 exceeds scoped VMEM even with i16 planes (21.9M vs 16M);
    # keep the probe at the production batch
    for B in (256,):
        ra = [rng.integers(0, n, B).astype(np.int32) for _ in range(8)]
        rb = [rng.integers(0, n, B).astype(np.int32) for _ in range(8)]
        a_dev = [jnp.take(seq_idx, jnp.asarray(r), axis=0) for r in ra]
        la_dev = [jnp.take(lengths, jnp.asarray(r)) for r in ra]
        b_dev = [jnp.take(seq_idx, jnp.asarray(r), axis=0) for r in rb]
        lb_dev = [jnp.take(lengths, jnp.asarray(r)) for r in rb]
        sync((a_dev[-1],))

        # (a) same input every call
        calls_same = [
            lambda: nw_similarity_batch_pallas(
                a_dev[0], la_dev[0], b_dev[0], lb_dev[0], sub
            )
        ]
        marginal(calls_same, sync, f"B={B} bare kernel, same input", B)

        # (b) rotate over 8 pre-staged inputs
        calls_diff = [
            (lambda i=i: nw_similarity_batch_pallas(
                a_dev[i], la_dev[i], b_dev[i], lb_dev[i], sub
            ))
            for i in range(8)
        ]
        marginal(calls_diff, sync, f"B={B} bare kernel, varied input", B)

        # (c) bench-style stack fn (gather+repeat+tiled kernel), tc=1
        t = int(np.sqrt(B))
        fn = api._nw_tile_stack_fn(t, "pallas", 10, 4, False)
        tiles_r = [
            jnp.asarray(rng.integers(0, n, (1, t)).astype(np.int32))
            for _ in range(8)
        ]
        tiles_c = [
            jnp.asarray(rng.integers(0, n, (1, t)).astype(np.int32))
            for _ in range(8)
        ]
        calls_stack = [
            (lambda i=i: fn(seq_idx, lengths, sub, tiles_r[i], tiles_c[i]))
            for i in range(8)
        ]
        marginal(
            calls_stack, sync, f"t={t} stack fn (gather+tiled), varied",
            t * t,
        )


if __name__ == "__main__":
    main()
