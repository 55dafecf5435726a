"""Top-k similarity graph for large sequence sets (sparse path).

A dense [N, N] float64 similarity matrix stops being viable around
N ≈ 30k (the BASELINE 100k+ config would need 80 GB).  For the
large-scale path we never materialize it: each row block's agreement
counts are computed on device, immediately reduced to the row's top-k
neighbors with ``lax.top_k``, and only the [N, k] neighbor lists leave
the device.  Louvain then runs on the sparse symmetrized k-NN graph —
the standard construction for similarity-graph clustering at scale.

Sharding: row blocks are data-parallel across the mesh exactly like the
dense agreement kernel (signatures replicated, output rows sharded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse

from .minhash import minhash_signatures  # noqa: F401  (re-export context)


@functools.partial(jax.jit, static_argnames=("k", "block"))
def _topk_kernel(sigs: jnp.ndarray, *, k: int, block: int):
    """Per-row top-k agreement counts.

    sigs: uint32 [N, H], N a multiple of ``block``.
    Returns (counts int32 [N, k], neighbor indices int32 [N, k]);
    self-matches are excluded by masking the diagonal to -1.
    """
    n, n_hash = sigs.shape
    # counts <= n_hash, so int8 accumulation is exact for every real
    # n_hash (<= 127) and packs 4x denser through the VPU (probed on
    # chip: -15% on the 100k sweep, bit-identical vals and indices)
    cdt = jnp.int8 if n_hash <= 127 else jnp.int32

    def row_block(i, acc):
        vals_acc, idx_acc = acc
        blk = jax.lax.dynamic_slice(sigs, (i * block, 0), (block, n_hash))
        eq = blk[:, None, :] == sigs[None, :, :]
        counts = jnp.sum(eq, axis=-1, dtype=cdt)  # [block, N]
        row_ids = i * block + jnp.arange(block, dtype=jnp.int32)
        col_ids = jnp.arange(n, dtype=jnp.int32)
        counts = jnp.where(
            col_ids[None, :] == row_ids[:, None], cdt(-1), counts
        )
        # top_k on float32: ~3.3x faster than the int32 sort on TPU and
        # value-exact — counts are small integers (<= n_hash << 2^24, so
        # f32-representable).  Tie ORDER among equal counts is not a
        # documented XLA contract across backends; lowest-index-first is
        # empirically verified on the CPU mesh (tests/test_topk_graph.py)
        # and re-checked on the real chip every bench run (bench.py's
        # topk_f32_ties_stable canary).  (tools/probe_topk.py: the int32
        # sort was 92% of the whole agreement sweep)
        fvals, idx = jax.lax.top_k(counts.astype(jnp.float32), k)
        vals = fvals.astype(jnp.int32)
        vals_acc = jax.lax.dynamic_update_slice(
            vals_acc, vals, (i * block, 0)
        )
        idx_acc = jax.lax.dynamic_update_slice(
            idx_acc, idx.astype(jnp.int32), (i * block, 0)
        )
        return vals_acc, idx_acc

    vals0 = jnp.zeros((n, k), dtype=jnp.int32)
    idx0 = jnp.zeros((n, k), dtype=jnp.int32)
    return jax.lax.fori_loop(0, n // block, row_block, (vals0, idx0))


def minhash_topk(
    sigs: np.ndarray | jnp.ndarray,
    k: int = 64,
    *,
    block: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """(similarities float64 [N, k], neighbor indices int32 [N, k]).

    Similarity = agreement_count / n_hash, like the dense kernel
    (src/minHash.cpp:174 semantics); self-pairs excluded.
    """
    sigs = jnp.asarray(sigs, dtype=jnp.uint32)
    n, n_hash = sigs.shape
    k = min(k, max(n - 1, 1))
    n_pad = -(-n // block) * block
    padded = sigs
    if n_pad != n:
        fill = (
            jnp.arange(1, n_pad - n + 1, dtype=jnp.uint32)[:, None]
            + jnp.uint32(0x7FFFFFFF)
        ) * jnp.ones((1, n_hash), dtype=jnp.uint32)
        padded = jnp.concatenate([sigs, fill], axis=0)
        # guard: padded rows can appear as neighbors with count 0 only
    vals, idx = _topk_kernel(padded, k=k, block=block)
    vals = np.asarray(vals)[:n].astype(np.float64) / float(n_hash)
    idx = np.array(idx)[:n]  # writable copy (device buffers are read-only)
    # drop phantom neighbors pointing at padded rows
    phantom = idx >= n
    vals[phantom] = 0.0
    idx[phantom] = 0
    return vals, idx


def knn_graph(
    vals: np.ndarray,
    idx: np.ndarray,
    *,
    threshold: float = 0.0,
) -> sparse.csr_matrix:
    """Symmetric CSR adjacency from top-k neighbor lists.

    Edges with similarity < ``threshold`` (or 0) are dropped; mutual
    duplicates are merged by max.
    """
    n, k = vals.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), k)
    cols = idx.ravel().astype(np.int64)
    w = vals.ravel()
    keep = (w > 0) & (w >= threshold) & (rows != cols)
    rows, cols, w = rows[keep], cols[keep], w[keep]
    adj = sparse.coo_matrix((w, (rows, cols)), shape=(n, n)).tocsr()
    sym = adj.maximum(adj.T)
    return sym.tocsr()


def cluster_large(
    sequences,
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    top_k: int = 64,
    thresh_p: float = 0.8,
    resolution: float = 1.05,
    louvain_seed: int = 0,
    chunk: int | None = None,
    mesh=None,
    timings: dict | None = None,
) -> np.ndarray:
    """Large-N MinHash clustering without a dense matrix.

    signatures → per-row top-k graph → quantile threshold over observed
    edge weights → Louvain.  Returns a 1-based membership vector,
    API-compatible with :func:`dynaalign_tpu.cluster.netcluster`.

    Pass a ``jax.sharding.Mesh`` as ``mesh`` to run the top-k reduction
    row-sharded across devices (parallel.sharded_minhash_topk —
    byte-identical to the single-device path, tests/test_parallel.py).

    Pass a dict as ``timings`` to receive per-stage wall-clock seconds
    (keys: ``signatures``, ``topk``, ``graph``, ``louvain``).
    """
    import time

    from ..cluster.louvain import louvain
    from ..encode import encode

    seqs = list(sequences)
    enc = encode(seqs, validate=False)
    t0 = time.perf_counter()
    sigs = minhash_signatures(
        enc.ascii, enc.lengths, k=k, n_hash=n_hash, seed=seed, chunk=chunk
    )
    sigs = np.asarray(sigs)  # fetch = sync point for the timing split
    t1 = time.perf_counter()
    if mesh is not None:
        from ..parallel import sharded_minhash_topk

        vals, idx = sharded_minhash_topk(sigs, k=top_k, mesh=mesh)
    else:
        vals, idx = minhash_topk(sigs, k=top_k)
    t2 = time.perf_counter()
    pos = vals[vals > 0]
    t = float(np.quantile(pos, thresh_p)) if pos.size else 0.0
    adj = knn_graph(vals, idx, threshold=t)
    # keep self-loops like the dense path (unit diagonal)
    adj = adj + sparse.eye(adj.shape[0], format="csr")
    t3 = time.perf_counter()
    membership = louvain(
        adj, resolution=resolution, seed=louvain_seed
    ).membership + 1
    t4 = time.perf_counter()
    if timings is not None:
        timings.update(
            signatures=t1 - t0, topk=t2 - t1, graph=t3 - t2,
            louvain=t4 - t3,
        )
    return membership
