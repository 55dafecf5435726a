"""Stage-by-stage marginal cost of the round-2 NW score prepass, plus a
B=512 int16-plane kernel feasibility check.

Stages (each its own jitted fn, marginal = (t(K2)-t(K1))/(K2-K1)):
  (a) one-hot + 2 einsums -> int8 [M, N, B]
  (b) (a) + pad + reshape/slice (skew) -> [Mp1, D, B]
  (c) (b) + major-axis transpose -> [D, Mp1, B]  (= production prepass)
  (d) the banded DP kernel alone on pre-staged sd
Usage: python tools/probe_prepass2.py [B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
K1, K2, REPS = 2, 8, 3


def marginal(fn, sync, label, pairs):
    def window(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        sync(out)
        return time.perf_counter() - t0

    for _ in range(2):
        sync(fn())
    t1 = min(window(K1) for _ in range(REPS))
    t2 = min(window(K2) for _ in range(REPS))
    per = (t2 - t1) / (K2 - K1)
    print(
        f"{label:40s} {per*1e3:7.2f} ms/call ({pairs/per:9.0f} pairs/s)",
        flush=True,
    )
    return per


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynaalign_tpu import blosum, encode
    from dynaalign_tpu.io.datasets import load_sequences
    from dynaalign_tpu.ops.nw_pallas import (
        _band_enabled,
        _pack_score_diagonals,
        _run_kernel,
        nw_i16_ok,
    )

    seqs = load_sequences("h3n2sample", limit=max(2 * B, 64))
    max_len = max(len(s) for s in seqs)
    pad = -(-(max_len + 1) // 8) * 8 - 1
    enc = encode.encode(seqs, pad_to=pad)
    sub_np = blosum.get_matrix("BLOSUM62")
    sub = jnp.asarray(sub_np)
    rng = np.random.default_rng(0)
    ra = rng.integers(0, enc.n, B)
    rb = rng.integers(0, enc.n, B)
    a_idx = jnp.asarray(enc.indices[ra])
    b_idx = jnp.asarray(enc.indices[rb])
    a_len = jnp.asarray(enc.lengths[ra])
    b_len = jnp.asarray(enc.lengths[rb])
    m = n = pad
    mp1 = m + 1
    d_total = m + n
    print(f"B={B} m=n={m} D={d_total} band={_band_enabled(mp1)}")

    def sync(x):
        np.asarray(x.ravel()[:4] if hasattr(x, "ravel") else x[0])

    @jax.jit
    def stage_a(a, b):
        oa = jax.nn.one_hot(a, 32, dtype=jnp.bfloat16)
        ob = jax.nn.one_hot(b, 32, dtype=jnp.bfloat16)
        sub2 = (2 * sub + jnp.eye(32, dtype=sub.dtype)).astype(
            jnp.bfloat16
        )
        rows = jnp.einsum(
            "bmk,kl->bml", oa, sub2, preferred_element_type=jnp.bfloat16
        )
        return jnp.einsum(
            "bml,bnl->mnb", rows, ob, preferred_element_type=jnp.bfloat16
        ).astype(jnp.int8)

    @jax.jit
    def stage_b(a, b):
        packed = stage_a.__wrapped__(a, b)
        w = n + mp1
        x = jnp.pad(packed, ((1, 0), (0, w - n), (0, 0)))
        flat = x.reshape(mp1 * w, B)
        return flat[: mp1 * (w - 1)].reshape(mp1, w - 1, B)

    @jax.jit
    def stage_c(a, b):
        return _pack_score_diagonals(a, b, sub)

    marginal(lambda: stage_a(a_idx, b_idx), sync, "a: einsums->int8 [M,N,B]", B)
    marginal(lambda: stage_b(a_idx, b_idx), sync, "b: + skew [Mp1,D,B]", B)
    marginal(lambda: stage_c(a_idx, b_idx), sync, "c: + transpose [D,Mp1,B] (prod)", B)

    sd = stage_c(a_idx, b_idx)
    alen = a_len.astype(jnp.int32).reshape(1, 1, B)
    fd = (a_len + b_len).astype(jnp.int32).reshape(1, 1, B)
    i16 = nw_i16_ok(m, n, 10, 4, sub_np)
    band = _band_enabled(mp1)

    @jax.jit
    def kern(sd, alen, fd):
        return _run_kernel(
            sd[None], alen, fd, (mp1, B), d_total, 10, 4, False,
            i16, 2, n, band,
        )

    marginal(lambda: kern(sd, alen, fd), sync, f"d: DP kernel (band={band}, i16={i16})", B)


if __name__ == "__main__":
    main()
