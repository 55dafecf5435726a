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

    from ..ops import PALLAS_MAX_MP1

    max_len = max(len(s) for s in sequences)
    if tpu_available() and max_len <= 127:
        pad_to = -(-(max_len + 1) // 8) * 8 - 1
        backend = "pallas_short"
        batch = _short_batch(pad_to + 1)
    elif tpu_available() and max_len < PALLAS_MAX_MP1 - 8:
        # sublane (8-multiple) padding, matching api.similarity_nw —
        # the old 128-multiple pad cost +13% dead DP area at h3n2 scale
        pad_to = -(-(max_len + 1) // 8) * 8 - 1
        backend = "pallas"
    else:
        # multi-kilobase: pick_nw_backend selects the xl Pallas layout
        # (round 5) or scan beyond its ceiling
        pad_to = None
        backend = "auto"
    # pad_multiple only applies to the scan fallback: passing it
    # together with an explicit pad_to would round pad_to itself up to
    # a multiple of 8 (encode.py:100-103), silently breaking the
    # (m+1) % 8 == 0 Pallas padding (mp1 17 instead of 16 for 12-mers)
    # and overrunning the batch sizer's VMEM budget by one DP row
    if pad_to is not None:
        enc = encode(sequences, pad_to=pad_to)
    else:
        enc = encode(sequences, pad_multiple=8)
    if backend == "auto":
        from ..ops import pick_nw_backend

        backend = pick_nw_backend(enc.max_len, enc.max_len)
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
    prefilter_threshold: float | None = None,
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
) -> np.ndarray:
    """MH prefilter + exact NW rescoring of the surviving pairs.

    Pairs below the MH threshold keep similarity 0; the rest are
    replaced with exact NW percent identity.  Diagonal is 1.0.  The
    threshold is the ``prefilter_quantile`` of all off-diagonal MH
    values, or ``prefilter_threshold`` verbatim when given (the knob
    the sparse path shares — see :func:`similarity_hybrid_sparse`).
    """
    sequences = list(sequences)
    n = len(sequences)
    mh = similarity_mh(sequences, k=k, n_hash=n_hash, seed=seed)
    iu = np.triu_indices(n, k=1)
    vals = mh[iu]
    if prefilter_threshold is not None:
        t = prefilter_threshold
    else:
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


def hybrid_topk_edges(
    sequences: Sequence[str],
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    top_k: int = 64,
    prefilter_quantile: float = 0.8,
    prefilter_threshold: float | None = None,
    chunk: int | None = None,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """MH top-k prefilter edge list for the sparse hybrid path.

    Builds seeded MinHash signatures, reduces each row to its ``top_k``
    strongest neighbors on device (ops.topk_graph.minhash_topk — never
    materializing the dense [N, N] matrix), dedups to unique i < j
    edges, and keeps edges at/above the MH threshold.  The threshold is
    ``prefilter_threshold`` verbatim when given; otherwise the
    ``prefilter_quantile`` of the observed positive edge weights (with
    top_k < N-1 this population is biased toward strong edges relative
    to the dense path's all-pairs quantile — the inherent price of
    never scoring the sub-top-k mass; pass an absolute threshold for
    exact dense-path agreement).

    Returns (pair_i, pair_j, mh_weight) with pair_i < pair_j.
    """
    from ..ops.minhash import minhash_signatures
    from ..ops.topk_graph import minhash_topk

    seqs = list(sequences)
    n = len(seqs)
    enc = encode(seqs)
    sigs = minhash_signatures(
        enc.ascii, enc.lengths, k=k, n_hash=n_hash, seed=seed,
        chunk=chunk,
    )
    if mesh is not None:
        from ..parallel import sharded_minhash_topk

        vals, idx = sharded_minhash_topk(
            np.asarray(sigs), k=top_k, mesh=mesh
        )
    else:
        vals, idx = minhash_topk(np.asarray(sigs), k=top_k)
    kk = vals.shape[1]
    rows = np.repeat(np.arange(n, dtype=np.int64), kk)
    cols = idx.ravel().astype(np.int64)
    w = vals.ravel()
    keep = (w > 0) & (rows != cols)
    rows, cols, w = rows[keep], cols[keep], w[keep]
    lo = np.minimum(rows, cols)
    hi = np.maximum(rows, cols)
    key = lo * n + hi
    _, first = np.unique(key, return_index=True)
    lo, hi, w = lo[first], hi[first], w[first]
    if prefilter_threshold is not None:
        t = prefilter_threshold
    else:
        t = float(np.quantile(w, prefilter_quantile)) if w.size else 0.0
    sel = w >= t
    return (
        lo[sel].astype(np.int32),
        hi[sel].astype(np.int32),
        w[sel],
    )


def similarity_hybrid_sparse(
    sequences: Sequence[str],
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    top_k: int = 64,
    prefilter_quantile: float = 0.8,
    prefilter_threshold: float | None = None,
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
    chunk: int | None = None,
    mesh=None,
    timings: dict | None = None,
):
    """Sparse hybrid similarity: MH top-k prefilter + exact NW edge
    rescoring, without ever materializing a dense [N, N] matrix.

    The dense :func:`similarity_hybrid` (BASELINE config 4) quantiles
    the full upper triangle — ~80 GB of float64 at N = 100k.  This path
    composes the device-side top-k graph (the config-5 machinery) with
    ``nw_rescore_pairs``, so the exact-NW flagship flow reaches the
    scale the reference could never touch (/root/reference/src/
    minHash.cpp:160-178 is dense-only; R/clusterbreak.R:185 is the
    hybrid composition point).  With ``top_k >= N-1`` and an absolute
    ``prefilter_threshold``, the result equals the dense path exactly
    (tests/test_hybrid_sparse.py).

    Returns a scipy.sparse CSR [N, N] with exact NW percent identity on
    the kept edges (symmetric) and a unit diagonal.

    Pass a dict as ``timings`` for per-stage seconds (keys: ``edges``
    = signatures+topk+threshold, ``rescore``; plus ``n_edges``).
    """
    import time

    from scipy import sparse

    seqs = list(sequences)
    n = len(seqs)
    t0 = time.perf_counter()
    pi, pj, _ = hybrid_topk_edges(
        seqs, k=k, n_hash=n_hash, seed=seed, top_k=top_k,
        prefilter_quantile=prefilter_quantile,
        prefilter_threshold=prefilter_threshold, chunk=chunk,
        mesh=mesh,
    )
    t1 = time.perf_counter()
    if len(pi):
        sims = nw_rescore_pairs(
            seqs, pi, pj, matrix_name=matrix_name,
            gap_open=gap_open, gap_ext=gap_ext,
        )
    else:
        sims = np.zeros(0, dtype=np.float64)
    t2 = time.perf_counter()
    if timings is not None:
        timings.update(
            edges=t1 - t0, rescore=t2 - t1, n_edges=int(len(pi))
        )
    adj = sparse.coo_matrix(
        (
            np.concatenate([sims, sims, np.ones(n)]),
            (
                np.concatenate([pi, pj, np.arange(n)]),
                np.concatenate([pj, pi, np.arange(n)]),
            ),
        ),
        shape=(n, n),
    ).tocsr()
    return adj


def cluster_large_exact(
    sequences,
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    top_k: int = 64,
    thresh_p: float = 0.8,
    prefilter_threshold: float | None = None,
    matrix_name: str = "BLOSUM62",
    gap_open: int = 10,
    gap_ext: int = 4,
    resolution: float = 1.05,
    louvain_seed: int = 0,
    chunk: int | None = None,
    mesh=None,
    timings: dict | None = None,
) -> np.ndarray:
    """Large-N clustering on EXACT NW edge weights: MH top-k prefilter →
    NW rescoring of the surviving edges → Louvain.

    The exact-rescored sibling of ops.topk_graph.cluster_large: same
    sparse scaling (no dense matrix anywhere), but the graph Louvain
    sees carries exact percent-identity weights instead of Jaccard
    estimates.  Returns a 1-based membership vector.

    Pass a dict as ``timings`` for per-stage seconds (``edges``,
    ``rescore``, ``louvain``; plus ``n_edges``).
    """
    import time

    from ..cluster.louvain import louvain

    adj = similarity_hybrid_sparse(
        sequences, k=k, n_hash=n_hash, seed=seed, top_k=top_k,
        prefilter_quantile=thresh_p,
        prefilter_threshold=prefilter_threshold,
        matrix_name=matrix_name, gap_open=gap_open, gap_ext=gap_ext,
        chunk=chunk, mesh=mesh, timings=timings,
    )
    t0 = time.perf_counter()
    membership = louvain(
        adj, resolution=resolution, seed=louvain_seed
    ).membership + 1
    if timings is not None:
        timings["louvain"] = time.perf_counter() - t0
    return membership


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
                prefilter_threshold=cfg.hybrid.prefilter_threshold,
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
