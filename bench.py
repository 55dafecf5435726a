"""Headline benchmark: all-pairs exact-NW similarity throughput.

Measures the TPU-native wavefront NW engine on real h3n2sample HA proteins
(~566 aa, the BASELINE.json config) against the serial C++ baseline — the
reference's similarityNW driver is single-threaded
(src/pairwiseSeqAlign.cpp:340-352), so ``vs_baseline`` is the speedup the
BASELINE "≥10x pairs/sec on one chip" target is scored on.

The headline runs at n=1000 (500,500 pairs, the VERDICT-mandated scale;
~5 s of device time, so launch overhead is amortized) through the
DEFAULT driver, which since round 4 routes long-regime sweeps through
the fused single-dispatch path (load-robust, docs/PERF.md "Load
windows").  A secondary n=256 run reports both dispatch shapes —
fused (default) and direct per-tile launches (DYNAALIGN_NW_FUSED=0) —
for round-over-round comparability.

Prints ONE JSON line:
  {"metric": "nw_allpairs_pairs_per_sec", "value": ..., "unit": "pairs/s",
   "vs_baseline": ..., ...extra context fields}
"""

import json
import os
import sys
import time

import numpy as np

N_SEQS = int(os.environ.get("BENCH_NW_SEQS", "1000"))
N_SMALL = int(os.environ.get("BENCH_NW_SMALL", "256"))
N_BASELINE = int(os.environ.get("BENCH_BASELINE_SEQS", "24"))
REPS = int(os.environ.get("BENCH_REPS", "6"))


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax

    from dynaalign_tpu.utils import enable_persistent_cache

    enable_persistent_cache()

    from dynaalign_tpu import oracle
    from dynaalign_tpu.api import similarity_nw
    from dynaalign_tpu.io.datasets import load_sequences

    seqs = load_sequences("h3n2sample", limit=N_SEQS)
    lens = np.array([len(s) for s in seqs], dtype=np.float64)
    n = len(seqs)
    pair_cells = lens[:, None] * lens[None, :]
    total_cells = float(np.triu(pair_cells).sum())
    n_pairs = n * (n + 1) // 2

    # absorb the per-process relay warmup before timing anything
    np.asarray(jax.numpy.zeros(4) + 1)

    def time_best(fn, reps):
        best = float("inf")
        out = fn()  # compile + first run
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return best, out

    # --- headline: n=1000 through the DEFAULT (fused) driver ---------------
    tpu_time, sims = time_best(lambda: similarity_nw(seqs), REPS)
    tpu_pairs_per_sec = n_pairs / tpu_time
    tpu_cells_per_sec = total_cells / tpu_time

    # --- secondary: n=256, both dispatch shapes ----------------------------
    small = seqs[:N_SMALL]
    ns = len(small)
    small_pairs = ns * (ns + 1) // 2
    t_fused, sims_small = time_best(lambda: similarity_nw(small), REPS)

    def run_direct():
        os.environ["DYNAALIGN_NW_FUSED"] = "0"
        try:
            return similarity_nw(small)
        finally:
            os.environ.pop("DYNAALIGN_NW_FUSED", None)

    t_direct, sims_direct = time_best(run_direct, 2)
    fused_equals_direct = bool(np.array_equal(sims_small, sims_direct))

    # --- CPU baseline (serial, reference-equivalent) -----------------------
    base_seqs = seqs[:N_BASELINE]
    nb = len(base_seqs)
    base_pairs = nb * (nb + 1) // 2
    cpu_time = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        base = oracle.nw_similarity(base_seqs, n_threads=1)
        cpu_time = min(cpu_time, time.perf_counter() - t0)
    cpu_pairs_per_sec = base_pairs / cpu_time

    # correctness spot check on the overlapping block (headline output)
    ok = bool(np.array_equal(sims[:nb, :nb], base))

    # short-kernel on-chip bit-exactness (12-mer regime; the headline
    # exercises only the long regime) + i16 eligibility evidence
    from dynaalign_tpu import blosum
    from dynaalign_tpu.ops import nw_i16_ok

    short_seqs = load_sequences("evp_peparray", limit=160)
    short_ok = bool(
        np.array_equal(
            similarity_nw(short_seqs),
            oracle.nw_similarity(short_seqs, n_threads=0),
        )
    )
    pad = -(-(max(len(s) for s in seqs) + 1) // 8) * 8 - 1
    i16_on = bool(
        nw_i16_ok(pad, pad, 10, 4, blosum.get_matrix("BLOSUM62"))
    )

    # f32-top_k tie-order canary on the REAL chip: the sparse graph path
    # relies on lax.top_k breaking equal counts lowest-index-first, which
    # is not a documented XLA contract on every backend (advisor r3);
    # verify it here against a stable host-side sort
    from dynaalign_tpu.ops.topk_graph import minhash_topk

    trng = np.random.default_rng(7)
    tsigs = trng.integers(0, 3, size=(96, 8)).astype(np.uint32)
    _, tidx = minhash_topk(tsigs, k=7, block=32)
    tcounts = (
        (tsigs[:, None, :] == tsigs[None, :, :]).sum(-1).astype(np.int64)
    )
    np.fill_diagonal(tcounts, -1)
    ties_ok = all(
        np.array_equal(
            tidx[i], np.argsort(-tcounts[i], kind="stable")[:7]
        )
        for i in range(96)
    )

    result = {
        "metric": "nw_allpairs_pairs_per_sec",
        "value": round(tpu_pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(tpu_pairs_per_sec / cpu_pairs_per_sec, 2),
        "n_seqs": n,
        "n_pairs": n_pairs,
        "mean_len": round(float(lens.mean()), 1),
        "tpu_cell_updates_per_sec": round(tpu_cells_per_sec, 0),
        "tpu_seconds": round(tpu_time, 3),
        "baseline_pairs_per_sec": round(cpu_pairs_per_sec, 2),
        "bit_exact_vs_oracle": ok,
        "short_kernel_bit_exact": short_ok,
        "i16_planes_enabled": i16_on,
        "topk_f32_ties_stable": bool(ties_ok),
        "small_n": ns,
        "small_fused_pairs_per_sec": round(small_pairs / t_fused, 2),
        "small_direct_pairs_per_sec": round(small_pairs / t_direct, 2),
        "fused_equals_direct": fused_equals_direct,
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
