"""dynaalign_tpu — a TPU-native peptide similarity & clustering framework.

A from-scratch rebuild of the capabilities of DynaAlign (reference R/Rcpp
package syl051088/DynaAlign) designed for TPU hardware: MinHash and
Needleman–Wunsch similarity as jitted JAX/Pallas kernels over
integer-encoded sequences, all-pairs computation tiled across a
``jax.sharding.Mesh``, and Louvain / clusterbreak / consensus layers
consuming the device-computed matrices.

Public API (parity with the reference's 17 exports, NAMESPACE:3-19):
  similarity_mh, similarity_nw           — similarityMH / similarityNW
  clusterbreak, netcluster, louvain_mod  — clustering layer
  cluster_consensus, consensus_plot      — consensus layer
  minhash, shingle, create_vocab, ...    — pure-reference MinHash twin
  compute_similarity_stats, plot_similarity_matrix
"""

from . import blosum, encode  # noqa: F401
from .encode import EncodedSeqs, encode as encode_sequences  # noqa: F401

__version__ = "0.1.0"

from .api import (  # noqa: F401,E402
    MinHashEngine,
    similarity_mh,
    similarity_nw,
    similarity_nw_bucketed,
)
from .cluster import (  # noqa: F401,E402
    ClusterBreakResult,
    clusterbreak,
    louvain,
    louvain_mod,
    netcluster,
)
from .consensus import (  # noqa: F401,E402
    cluster_consensus,
    consensus_sequence,
    progressive_msa,
)
from .analysis import (  # noqa: F401,E402
    compute_similarity_stats,
    consensus_plot,
    plot_similarity_matrix,
)
from .models import (  # noqa: F401,E402
    Pipeline,
    cluster_large_exact,
    minhash,
    shingle,
    similarity_hybrid,
    similarity_hybrid_sparse,
)
from .ops.topk_graph import cluster_large  # noqa: F401,E402
