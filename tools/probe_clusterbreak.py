"""Stage decomposition of the full-scale clusterbreak run (round 5).

Wraps the sim_fn / cluster_fn / quantile stages with timers to find
where cluster_seconds actually goes at config-3 scale.

Usage: python tools/probe_clusterbreak.py [limit]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dynaalign_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from dynaalign_tpu import MinHashEngine
    from dynaalign_tpu.cluster import clusterbreak
    from dynaalign_tpu.cluster.louvain import louvain
    from dynaalign_tpu.io.datasets import load_sequences

    limit = int(sys.argv[1]) if len(sys.argv) > 1 else 8103
    seqs = list(load_sequences("h3n2sample", limit=limit))
    np.asarray(jnp.zeros(4) + 1)  # relay warmup

    t_build0 = time.perf_counter()
    eng = MinHashEngine(seqs, k=4, n_hash=500, seed=0)
    t_build = time.perf_counter() - t_build0

    stats = {"sim": 0.0, "louvain": 0.0, "n_sim": 0, "sizes": []}

    def sim_fn(sub):
        t0 = time.perf_counter()
        out = eng(sub)
        stats["sim"] += time.perf_counter() - t0
        stats["n_sim"] += 1
        stats["sizes"].append(len(sub))
        return out

    def cluster_fn(adj):
        t0 = time.perf_counter()
        out = louvain(adj, resolution=1.05, seed=0).membership + 1
        stats["louvain"] += time.perf_counter() - t0
        return out

    t0 = time.perf_counter()
    result = clusterbreak(
        seqs, thresh_p=0.8, size_max=800, size_min=3,
        sim_fn=sim_fn, cluster_fn=cluster_fn, verbose=False,
    )
    total = time.perf_counter() - t0
    other = total - stats["sim"] - stats["louvain"]
    sizes = np.array(stats["sizes"])
    print(
        f"n={len(seqs)} engine_build={t_build:.2f}s total={total:.2f}s\n"
        f"  sim (agreement dispatches): {stats['sim']:.2f}s over "
        f"{stats['n_sim']} subsets\n"
        f"  louvain:                    {stats['louvain']:.2f}s\n"
        f"  other (quantile/host):      {other:.2f}s\n"
        f"  subset sizes: n>{np.quantile(sizes, [0.5, 0.9, 1.0])} "
        f"sum={sizes.sum()} sum_sq={float((sizes.astype(float)**2).sum()):.3g}\n"
        f"  clusters={len(np.unique(result.clustered_seq[:, 1]))} "
        f"filtered={len(result.filtered_seq)} conv={result.converged}",
        flush=True,
    )


if __name__ == "__main__":
    main()
