"""Getting started with dynaalign_tpu.

The reference package's vignette is an empty stub
(vignettes/getting-started.Rmd); this example walks the two canonical
flows from its README (README.md:33-64) end to end on the bundled data.

Run:  python examples/getting_started.py  [--limit 300]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from dynaalign_tpu import (  # noqa: E402
    cluster_consensus,
    clusterbreak,
    compute_similarity_stats,
    plot_similarity_matrix,
    similarity_mh,
    similarity_nw,
)
from dynaalign_tpu.analysis import consensus_plot  # noqa: E402
from dynaalign_tpu.io.datasets import load_sequences  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--limit", type=int, default=300)
    ap.add_argument("--outdir", default="examples/out")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    # --- Flow 1: peptide-array probes, MinHash similarity ------------------
    probes = load_sequences("evp_peparray", limit=args.limit)
    print(f"loaded {len(probes)} peptide-array probes (12-mers)")
    sim = similarity_mh(probes, k=2, n_hash=50, seed=0)
    stats = compute_similarity_stats(sim)
    print(f"MinHash similarity: {stats}")
    ax, *_ = plot_similarity_matrix(sim, cluster=True)
    heat = os.path.join(args.outdir, "peparray_heatmap.png")
    ax.figure.savefig(heat, dpi=120)
    print(f"wrote {heat}")

    # --- Flow 2: H3N2 HA proteins, clusterbreak + consensus ----------------
    seqs = list(dict.fromkeys(load_sequences("h3n2sample", limit=args.limit)))
    print(f"\nloaded {len(seqs)} unique H3N2 HA sequences (~566 aa)")
    nw_small = similarity_nw(seqs[:20])
    print(f"exact NW on 20 seqs: mean={np.triu(nw_small, 1).mean():.3f}")

    result = clusterbreak(
        seqs, thresh_p=0.8, size_max=100, size_min=3,
        sim_fn=lambda x: similarity_mh(x, k=4, n_hash=500, seed=0),
    )
    labeled = result.clustered_seq
    print(
        f"clusterbreak: {len(labeled)} sequences in "
        f"{len(set(labeled[:, 1]))} clusters, "
        f"{len(result.filtered_seq)} filtered"
    )

    consensus = cluster_consensus(labeled)
    print(f"consensus sequences: {len(consensus)}")
    for cid, cons in consensus[:3]:
        print(f"  cluster {cid}: {cons[:60]}...")

    ax, member = consensus_plot(consensus, k_size=2, hash_size=50)
    net = os.path.join(args.outdir, "consensus_network.png")
    ax.figure.savefig(net, dpi=120)
    print(f"wrote {net}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
