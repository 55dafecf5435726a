"""On-chip validation + marginal rate for the fused-scoring NW kernel.

Round-3 kernel: scores generated inside the kernel from the VMEM
substitution slab (no HBM score-diagonal tensor).  Checks bit-exactness
vs the C++ oracle at the production shape and measures the marginal
per-tile rate by chained-call differencing (docs/PERF.md methodology —
block_until_ready does not synchronize under the axon relay).

Usage: python tools/probe_fused.py [B] [LEN] [--no-band|--i32]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

args = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(args[0]) if len(args) > 0 else 256
LEN = int(args[1]) if len(args) > 1 else 566
if "--no-band" in sys.argv:
    os.environ["DYNAALIGN_NW_BAND"] = "0"
I16 = "--i32" not in sys.argv


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(repo, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dynaalign_tpu import blosum, encode, oracle
    from dynaalign_tpu.ops.nw_pallas import nw_similarity_batch_pallas

    rng = np.random.default_rng(0)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    lens = rng.integers(int(LEN * 0.8), LEN + 1, size=2 * B)
    seqs = ["".join(rng.choice(aas, size=l)) for l in lens]
    pad_to = -(-(LEN + 1) // 8) * 8 - 1
    enc = encode.encode(seqs, pad_to=pad_to)
    sub_np = blosum.get_matrix("BLOSUM62")
    sub = jnp.asarray(sub_np)
    a_idx = jnp.asarray(enc.indices[:B])
    a_len = jnp.asarray(enc.lengths[:B])
    b_idx = jnp.asarray(enc.indices[B:])
    b_len = jnp.asarray(enc.lengths[B:])

    print(f"device={jax.devices()[0]} B={B} pad_to={pad_to} i16={I16}",
          flush=True)
    t0 = time.perf_counter()
    r = nw_similarity_batch_pallas(
        a_idx, a_len, b_idx, b_len, sub, score_i16=I16
    )
    mt = np.asarray(r.matches)
    ln = np.asarray(r.length)
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # oracle bit-exactness on a sample of pairs (the oracle emits the
    # final double matches/length; exact float equality is the check)
    idx = rng.choice(B, size=min(64, B), replace=False)
    ok = True
    for i in idx:
        ref = oracle.nw_pair(seqs[i], seqs[B + i], "BLOSUM62", 10, 4)
        got = float(mt[i]) / float(ln[i])
        if got != ref:
            ok = False
            print(f"MISMATCH pair {i}: kernel {got!r} "
                  f"({mt[i]}/{ln[i]}) oracle {ref!r}")
    print(f"bit_exact_vs_oracle: {ok}", flush=True)

    def run_k(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = nw_similarity_batch_pallas(
                a_idx, a_len, b_idx, b_len, sub, score_i16=I16
            )
        np.asarray(out.matches)
        return time.perf_counter() - t0

    run_k(2)  # warm
    best = None
    for _ in range(4):
        t1, t2 = run_k(4), run_k(12)
        marg = (t2 - t1) / 8
        best = marg if best is None else min(best, marg)
        print(f"  t4={t1:.3f}s t12={t2:.3f}s marginal={marg * 1e3:.2f} "
              f"ms/tile -> {B / marg:.0f} pairs/s", flush=True)
    cells = float(np.sum(
        enc.lengths[:B].astype(np.int64) * enc.lengths[B:].astype(np.int64)
    ))
    print(f"best marginal: {best * 1e3:.2f} ms/tile = {B / best:.0f} "
          f"pairs/s, {cells / best / 1e9:.2f}e9 cells/s", flush=True)


if __name__ == "__main__":
    main()
