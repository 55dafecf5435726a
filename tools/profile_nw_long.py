"""Decompose long-layout NW e2e time: score prepass vs DP kernel.

Measures, on the real chip, the marginal per-call cost of
  (a) the full e2e tiled path (prepass + kernel, T=1, B=256, m=n=639)
  (b) the DP kernel alone on pre-staged packed score diagonals
  (c) the current prepass alone ([B,M,N] pack -> skew -> minor-axis
      transpose to [D, B, Mp1])
  (d) a transpose-light prepass variant that produces [D, Mp1, B] with
      the minor axis preserved (mnb-ordered einsum + skew + major-axis
      transpose only)
  (e) the DP kernel in the short layout (pairs on lanes) at the same
      long shapes, consuming (d)'s output

Marginal cost = (t(K2 calls) - t(K1 calls)) / (K2 - K1), synced by
fetching a tiny output slice (block_until_ready is a no-op under the
axon relay).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dynaalign_tpu import blosum, encode
from dynaalign_tpu.io.datasets import load_sequences
from dynaalign_tpu.ops.nw_pallas import (
    _pack_score_diagonals,
    _run_kernel,
)

B = 256
PAD = 639  # same padded length similarity_nw picks for h3n2 (~566 aa)
K1, K2 = 3, 9
REPS = 3


def _window(fn, sync, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn()
    sync(out)
    return time.perf_counter() - t0


def marginal(fn, sync, label):
    for _ in range(2):  # compile + warm, fully synced
        sync(fn())
    t_k1 = min(_window(fn, sync, K1) for _ in range(REPS))
    t_k2 = min(_window(fn, sync, K2) for _ in range(REPS))
    per = (t_k2 - t_k1) / (K2 - K1)
    print(
        f"{label:34s} {per * 1e3:8.2f} ms/call  "
        f"(t{K1}={t_k1 * 1e3:.1f}ms t{K2}={t_k2 * 1e3:.1f}ms)",
        flush=True,
    )
    return per


def pack_variant_mnb(a_idx, b_idx, sub):
    """[D, Mp1, B] packed diagonals; only a major-axis transpose."""
    bsz, m = a_idx.shape
    n = b_idx.shape[1]
    mp1 = m + 1
    w = n + mp1
    oa = jax.nn.one_hot(a_idx, 32, dtype=jnp.bfloat16)
    ob = jax.nn.one_hot(b_idx, 32, dtype=jnp.bfloat16)
    rows = jnp.einsum(
        "bmk,kl->bml", oa, sub.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    scores = jnp.einsum(
        "bml,bnl->mnb", rows, ob, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    match = (
        a_idx.T[:, None, :] == b_idx.T[None, :, :]
    ).astype(jnp.int32)  # [M, N, B]
    packed = (scores * 2 + match).astype(jnp.int8)  # [M, N, B]
    x = jnp.pad(packed, ((1, 0), (0, w - n), (0, 0)))  # [Mp1, W, B]
    flat = x.reshape(mp1 * w, bsz)
    skew = flat[: mp1 * (w - 1)].reshape(mp1, w - 1, bsz)
    # skew[i, d, b] == x[i, d - i, b]
    return jnp.transpose(skew, (1, 0, 2))  # [D, Mp1, B], minor intact


def main():
    seqs = load_sequences("h3n2sample", limit=64)
    enc = encode.encode(seqs, pad_to=PAD)
    sub = jnp.asarray(blosum.get_matrix("BLOSUM62"))
    rng = np.random.default_rng(0)
    ra = rng.integers(0, enc.n, B)
    rb = rng.integers(0, enc.n, B)
    a_idx = jnp.asarray(enc.indices[ra])
    b_idx = jnp.asarray(enc.indices[rb])
    a_len = jnp.asarray(enc.lengths[ra])
    b_len = jnp.asarray(enc.lengths[rb])

    m = PAD
    mp1 = m + 1
    d_total = 2 * m  # even already? 2*639=1278 even
    print(f"B={B} m=n={m} D={d_total}", flush=True)

    # ---- (c) current prepass ----
    pre_cur = jax.jit(_pack_score_diagonals)
    out_c = pre_cur(a_idx, b_idx, sub)

    def sync_slice(x=None):
        if x is None:
            return
        np.asarray(x[0, 0, :8])

    t_pre_cur = marginal(
        lambda: pre_cur(a_idx, b_idx, sub), sync_slice, "prepass current [D,B,Mp1]"
    )

    # ---- (d) variant prepass ----
    pre_var = jax.jit(pack_variant_mnb)
    out_d = pre_var(a_idx, b_idx, sub)
    t_pre_var = marginal(
        lambda: pre_var(a_idx, b_idx, sub), sync_slice, "prepass variant [D,Mp1,B]"
    )
    # correctness: variant == transpose of current
    ok = bool(
        jnp.array_equal(out_d, jnp.transpose(out_c, (0, 2, 1)))
    )
    print(f"variant prepass bit-equal: {ok}", flush=True)

    # ---- (b) kernel only, long layout ----
    sd_long = out_c  # [D, B, Mp1] on device
    alen = a_len.reshape(1, B, 1)
    fd = (a_len + b_len).reshape(1, B, 1)

    @jax.jit
    def kern_long(sd, alen, fd):
        return _run_kernel(
            sd[None], alen, fd, (B, mp1), 1, d_total, 10, 4, False
        )

    def sync_out(x=None):
        if x is None:
            return
        np.asarray(x)

    r_long = kern_long(sd_long, alen, fd)
    t_kern_long = marginal(
        lambda: kern_long(sd_long, alen, fd), sync_out, "kernel long [B,Mp1]"
    )

    # ---- (e) kernel only, short layout at long shapes ----
    sd_short = out_d  # [D, Mp1, B]
    alen_s = a_len.reshape(1, 1, B)
    fd_s = (a_len + b_len).reshape(1, 1, B)

    @jax.jit
    def kern_short(sd, alen, fd):
        return _run_kernel(
            sd[None], alen, fd, (mp1, B), 0, d_total, 10, 4, False
        )

    r_short = kern_short(sd_short, alen_s, fd_s)
    same = bool(
        jnp.array_equal(r_long[0, :, 0], r_short[0, 0, :])
    )
    print(f"short-layout kernel result equal: {same}", flush=True)
    t_kern_short = marginal(
        lambda: kern_short(sd_short, alen_s, fd_s), sync_out,
        "kernel short-layout [Mp1,B]",
    )

    # ---- (a) fused e2e, both variants ----
    @jax.jit
    def e2e_cur(a, b, alen, fd):
        sd = _pack_score_diagonals(a, b, sub)
        return _run_kernel(
            sd[None], alen, fd, (B, mp1), 1, d_total, 10, 4, False
        )

    @jax.jit
    def e2e_var(a, b, alen, fd):
        sd = pack_variant_mnb(a, b, sub)
        return _run_kernel(
            sd[None], alen, fd, (mp1, B), 0, d_total, 10, 4, False
        )

    e2e_cur(a_idx, b_idx, alen, fd)
    t_e2e_cur = marginal(
        lambda: e2e_cur(a_idx, b_idx, alen, fd), sync_out, "e2e current"
    )
    e2e_var(a_idx, b_idx, alen_s, fd_s)
    t_e2e_var = marginal(
        lambda: e2e_var(a_idx, b_idx, alen_s, fd_s), sync_out, "e2e variant"
    )

    print("---- summary (ms/call, B=256 pairs) ----")
    for name, t in [
        ("prepass current", t_pre_cur), ("prepass variant", t_pre_var),
        ("kernel long", t_kern_long), ("kernel short-layout", t_kern_short),
        ("e2e current", t_e2e_cur), ("e2e variant", t_e2e_var),
    ]:
        print(f"{name:22s} {t * 1e3:8.2f} ms  ({B / t:,.0f} pairs/s)")


if __name__ == "__main__":
    main()
