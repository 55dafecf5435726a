"""The flagship end-to-end pipeline: similarity → clusterbreak → consensus.

This is the framework's "model": the full peptide-clustering flow the
reference demonstrates in its README (README.md:33-64 — similarity matrix
→ clusterbreak → clusterconsensus), packaged behind one configurable
object.  Three similarity engines:

* ``"mh"``     — MinHash Jaccard estimate on TPU (similarityMH parity);
* ``"nw"``     — exact NW percent identity on TPU (similarityNW parity);
* ``"hybrid"`` — MH prefilter + exact NW rescoring of the surviving
  pairs (the viral-panel hybrid config, BASELINE.md config 4): cheap
  signatures prune the pair space, then only pairs at/above the MH
  quantile threshold go through the exact DP, batched through the same
  Pallas/scan kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from .. import blosum
from ..api import similarity_mh, similarity_nw
from ..cluster import ClusterBreakResult, clusterbreak
from ..config import PipelineConfig
from ..consensus import cluster_consensus
from ..encode import encode
from ..ops import tpu_available


def nw_rescore_pairs(
    sequences: Sequence[str],
    pair_i: np.ndarray,
    pair_j: np.ndarray,
    *,
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
    batch: int = 256,
) -> np.ndarray:
    """Exact NW similarity for an explicit pair list (batched on device).

    Routes through the same backend selection as ``similarity_nw``: the
    short (pairs-on-lanes) Pallas kernel for peptide-scale grids, the
    long layout above that, scan elsewhere — with tile stacks folding
    many batches into each kernel launch.
    """
    from ..api import _nw_pairlist_stack_fn, _short_batch, _tiles_per_launch

    max_len = max(len(s) for s in sequences)
    if tpu_available() and max_len <= 127:
        pad_to = -(-(max_len + 1) // 8) * 8 - 1
        backend = "pallas_short"
        batch = _short_batch(pad_to + 1)
    elif tpu_available() and max_len <= 4000:
        # sublane (8-multiple) padding, matching api.similarity_nw —
        # the old 128-multiple pad cost +13% dead DP area at h3n2 scale
        pad_to = -(-(max_len + 1) // 8) * 8 - 1
        backend = "pallas"
    else:
        pad_to = None
        backend = "scan"
    enc = encode(sequences, pad_to=pad_to, pad_multiple=8)
    seq_idx = jnp.asarray(enc.indices)
    lengths = jnp.asarray(enc.lengths)
    sub = jnp.asarray(blosum.get_matrix(matrix_name))

    n_pairs = len(pair_i)
    n_tiles = -(-max(n_pairs, 1) // batch)
    tc = _tiles_per_launch(
        enc.max_len, enc.max_len, batch, n_tiles, backend
    )
    n_tiles = -(-n_tiles // tc) * tc
    pad = n_tiles * batch
    pi = np.zeros(pad, dtype=np.int32)
    pj = np.zeros(pad, dtype=np.int32)
    pi[:n_pairs] = pair_i
    pj[:n_pairs] = pair_j
    pi = pi.reshape(n_tiles, batch)
    pj = pj.reshape(n_tiles, batch)
    from ..ops import nw_i16_ok

    i16 = backend.startswith("pallas") and nw_i16_ok(
        enc.max_len, enc.max_len, gap_open, gap_ext,
        blosum.get_matrix(matrix_name),
    )
    fn = _nw_pairlist_stack_fn(backend, gap_open, gap_ext, i16)
    # pre-stage index stacks on device (loop-interior transfers
    # serialize against the compute queue under the TPU relay)
    pi_dev = [jnp.asarray(pi[s : s + tc]) for s in range(0, n_tiles, tc)]
    pj_dev = [jnp.asarray(pj[s : s + tc]) for s in range(0, n_tiles, tc)]
    pend = []
    for rs, cs in zip(pi_dev, pj_dev):
        pend.append(fn(seq_idx, lengths, seq_idx, lengths, sub, rs, cs))
    mt = np.asarray(
        jnp.concatenate([p[0].reshape(-1) for p in pend])
    )[:n_pairs]
    ln = np.asarray(
        jnp.concatenate([p[1].reshape(-1) for p in pend])
    )[:n_pairs]
    with np.errstate(invalid="ignore", divide="ignore"):
        return mt.astype(np.float64) / ln


def similarity_hybrid(
    sequences: Sequence[str],
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    prefilter_quantile: float = 0.8,
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
) -> np.ndarray:
    """MH prefilter + exact NW rescoring of the surviving pairs.

    Pairs below the MH quantile threshold keep similarity 0; the rest are
    replaced with exact NW percent identity.  Diagonal is 1.0.
    """
    sequences = list(sequences)
    n = len(sequences)
    mh = similarity_mh(sequences, k=k, n_hash=n_hash, seed=seed)
    iu = np.triu_indices(n, k=1)
    vals = mh[iu]
    t = np.quantile(vals, prefilter_quantile) if vals.size else 0.0
    keep = vals >= t
    pi, pj = iu[0][keep], iu[1][keep]
    out = np.zeros((n, n), dtype=np.float64)
    if len(pi):
        sims = nw_rescore_pairs(
            sequences, pi, pj,
            matrix_name=matrix_name, gap_open=gap_open, gap_ext=gap_ext,
        )
        out[pi, pj] = sims
        out[pj, pi] = sims
    np.fill_diagonal(out, 1.0)
    return out


@dataclasses.dataclass
class PipelineResult:
    similarity: np.ndarray | None
    clusters: ClusterBreakResult
    consensus: np.ndarray


class Pipeline:
    """similarity → clusterbreak → cluster_consensus, configured once.

    The injectable ``sim_fn`` / ``cluster_fn`` extension point of the
    reference (R/clusterbreak.R:185-188) is preserved: pass callables to
    override either stage.
    """

    def __init__(
        self,
        config: PipelineConfig | None = None,
        *,
        sim_fn=None,
        cluster_fn=None,
    ):
        self.config = config or PipelineConfig()
        self._sim_fn = sim_fn
        self._cluster_fn = cluster_fn

    def similarity(self, sequences: Sequence[str]) -> np.ndarray:
        cfg = self.config
        if self._sim_fn is not None:
            return np.asarray(self._sim_fn(list(sequences)))
        if cfg.similarity == "mh":
            return similarity_mh(
                sequences, k=cfg.minhash.k, n_hash=cfg.minhash.n_hash,
                seed=cfg.minhash.seed,
            )
        if cfg.similarity == "nw":
            return similarity_nw(
                sequences, cfg.nw.matrix_name, cfg.nw.gap_open,
                cfg.nw.gap_ext,
            )
        if cfg.similarity == "nw_bucketed":
            from ..api import similarity_nw_bucketed

            return similarity_nw_bucketed(
                sequences, cfg.nw.matrix_name, cfg.nw.gap_open,
                cfg.nw.gap_ext,
            )
        if cfg.similarity == "hybrid":
            return similarity_hybrid(
                sequences, k=cfg.minhash.k, n_hash=cfg.minhash.n_hash,
                seed=cfg.minhash.seed,
                prefilter_quantile=cfg.hybrid.prefilter_quantile,
                matrix_name=cfg.nw.matrix_name,
                gap_open=cfg.nw.gap_open, gap_ext=cfg.nw.gap_ext,
            )
        raise ValueError(f"unknown similarity engine {cfg.similarity!r}")

    def cluster(
        self, sequences: Sequence[str], **overrides
    ) -> ClusterBreakResult:
        cfg = self.config.clusterbreak
        kwargs = dict(
            thresh_p=cfg.thresh_p, size_max=cfg.size_max,
            size_min=cfg.size_min, max_itr=cfg.max_itr,
            resolution=cfg.resolution, seed=cfg.seed, verbose=False,
        )
        kwargs.update(overrides)
        return clusterbreak(
            sequences,
            sim_fn=self._sim_fn or self.similarity,
            cluster_fn=self._cluster_fn,
            **kwargs,
        )

    def consensus(self, clusters: ClusterBreakResult) -> np.ndarray:
        cfg = self.config.consensus
        return cluster_consensus(
            clusters.clustered_seq,
            matrix_name=cfg.matrix_name, threshold=cfg.threshold,
        )

    def run(self, sequences: Sequence[str], **cluster_overrides) -> PipelineResult:
        clusters = self.cluster(sequences, **cluster_overrides)
        consensus = (
            self.consensus(clusters)
            if len(clusters.clustered_seq)
            else np.empty((0, 2), dtype=object)
        )
        return PipelineResult(
            similarity=None, clusters=clusters, consensus=consensus
        )
