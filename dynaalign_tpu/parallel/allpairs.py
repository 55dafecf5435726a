"""Mesh-sharded all-pairs similarity (the distributed core).

The reference's closest analogue is the OpenMP loop over the inner pair
index (src/minHash.cpp:164-167); here the all-pairs grid is decomposed
over a 2-D device mesh with ``shard_map``:

* **MinHash**: signatures [N, H] are built data-parallel (sharded over
  sequences on the flattened mesh), then all-gathered (they are tiny:
  N * H * 4 bytes) and each device computes its [N/pr, N/pc] block of the
  agreement-count matrix.  Communication = one all-gather of signatures +
  the final output assembly; everything else is local VPU work.

* **NW**: the upper-triangle pair-tile grid is enumerated on the host,
  round-robined across the flattened mesh for load balance (tiles have
  equal padded cost), and each device sweeps its tiles with the batched
  wavefront kernel (`ops.nw`).  Sequences are replicated (int8-packed,
  small); outputs are per-tile [t, t] (matches, length) blocks gathered
  at the end.  No collective is needed during the DP itself.

Both paths compile once per shape and run identically on a real TPU slice
or on XLA's host-platform virtual devices (tests/conftest.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import nw_batch_tiled, nw_i16_ok, pick_nw_backend
from .mesh import COLS, ROWS, make_mesh

__all__ = [
    "sharded_signature_agreement",
    "sharded_minhash_similarity",
    "sharded_nw_allpairs",
    "sharded_nw_allpairs_bucketed",
    "plan_nw_allpairs",
    "nw_allpairs_schedule_stats",
    "plan_bucket_group",
    "bucketed_schedule_stats",
    "sharded_minhash_topk",
]


def _pad_rows(arr: np.ndarray, multiple: int, fill=0) -> np.ndarray:
    n = arr.shape[0]
    n_pad = -(-n // multiple) * multiple
    if n_pad == n:
        return arr
    pad_width = [(0, n_pad - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width, constant_values=fill)


def _put(arr, mesh: Mesh, spec: P):
    """device_put with an explicit (possibly multi-process) sharding.

    Under ``jax.distributed`` the mesh spans non-addressable devices;
    host values are identical on every process (sequences are
    replicated per SURVEY.md §5), so each process materializes just its
    addressable shards.
    """
    return jax.device_put(
        arr, jax.sharding.NamedSharding(mesh, spec)
    )


def plan_bucket_group(
    npairs: int, ndev: int, max_batch: int, pallas_ok: bool = False
) -> tuple[int, int, int]:
    """(batch_g, t_batches, group_g) for one bucket-pair group —
    the exact quantities sharded_nw_allpairs_bucketed schedules with.
    Total computed pair slots = t_batches * batch_g (>= npairs; the
    excess recomputes pair 0 of the group and is discarded)."""
    batch_g = pick_group_batch(npairs, ndev, max_batch, pallas_ok)
    t_batches = max(-(-npairs // batch_g), 1)
    group_g = min(_SHARDED_GROUP, max(t_batches // ndev, 1))
    t_batches = -(-t_batches // (ndev * group_g)) * ndev * group_g
    return batch_g, t_batches, group_g


def bucketed_schedule_stats(
    sequences, *, ndev: int, bucket_edges=None, batch: int = 256,
    backend: str = "auto",
) -> dict:
    """Static per-device load statistics for the bucketed NW schedule.

    Per group every batch has equal padded cost (area = the two bucket
    edges' padded product), and t_batches is a whole multiple of
    ndev * group_g — so per-device batch counts are exactly equal
    within every group, and the only efficiency loss is padded slots.
    Reports the per-device area totals and the area-weighted
    pad-efficiency (real pair area / computed slot area).
    """
    from ..api import PALLAS_BUCKET_EDGES
    from ..encode import bucket_by_length
    from ..ops import pick_nw_backend

    seqs = list(sequences)
    n = len(seqs)
    if bucket_edges is None:
        bucket_edges = PALLAS_BUCKET_EDGES
    buckets = bucket_by_length(seqs, bucket_edges=tuple(bucket_edges))
    which = np.zeros(n, dtype=np.int64)
    for b, (pos, _) in enumerate(buckets):
        which[pos] = b
    iu = np.triu_indices(n)
    groups: dict[tuple[int, int], int] = {}
    for gi, gj in zip(which[iu[0]], which[iu[1]]):
        key = (int(gi), int(gj))
        groups[key] = groups.get(key, 0) + 1
    per_dev_area = np.zeros(ndev, dtype=np.float64)
    real_area = 0.0
    slot_area = 0.0
    for (ba, bb), npairs in groups.items():
        m_a = buckets[ba][1].max_len
        m_b = buckets[bb][1].max_len
        area = float(m_a) * float(m_b)
        pallas_ok = pick_nw_backend(
            m_a, m_b, backend, bsz=128
        ).startswith("pallas")
        batch_g, t_batches, group_g = plan_bucket_group(
            npairs, ndev, batch, pallas_ok
        )
        # equal per-device batch counts by construction
        per_dev_area += (t_batches // ndev) * batch_g * area
        real_area += npairs * area
        slot_area += t_batches * batch_g * area
    return {
        "ndev": ndev,
        "area_per_device": per_dev_area.tolist(),
        "area_spread": float(
            (per_dev_area.max() - per_dev_area.min())
            / max(per_dev_area.max(), 1.0)
        ),
        "balance": float(per_dev_area.mean() / per_dev_area.max()),
        "pad_efficiency": real_area / slot_area,
        "n_groups": len(groups),
    }


def pick_group_batch(
    npairs: int, ndev: int, max_batch: int, pallas_ok: bool = False
) -> int:
    """Pair-batch size for one bucket-pair group: the largest candidate
    that minimises padded slots (the grid quantum is ndev * batch pairs,
    so small groups take smaller batches).

    When the bucket-pair shape is Pallas-eligible (``pallas_ok``), only
    128-multiple batches are considered: a sub-128 batch would fail
    pick_nw_backend's lane check and silently drop the whole group to
    the scan backend — trading 2-4x padding inside the fast kernel for
    losing the kernel altogether.
    """

    def slots(b):
        return -(-npairs // (ndev * b)) * ndev * b

    sizes = (256, 128) if pallas_ok else (256, 128, 64, 32)
    cands = [b for b in sizes if b <= max_batch] or [max_batch]
    best = min(slots(b) for b in cands)
    return next(b for b in cands if slots(b) == best)


def _fetch_global(x) -> np.ndarray:
    """Fetch a (possibly cross-process) sharded array to host numpy."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True)
        )
    return np.asarray(x)


def sharded_signature_agreement(
    sigs: np.ndarray, mesh: Mesh | None = None
) -> np.ndarray:
    """All-pairs agreement counts on a 2-D mesh.

    Each (rows, cols) device computes its output block from its row-shard
    and col-shard of the replicated signature matrix.  Returns int32
    [N, N] counts (assembled on host).
    """
    if mesh is None:
        mesh = make_mesh()
    pr, pc = mesh.shape[ROWS], mesh.shape[COLS]
    n, h = sigs.shape
    lcm = pr * pc // np.gcd(pr, pc)
    padded = _pad_rows(np.asarray(sigs, dtype=np.uint32), lcm)
    n_pad = padded.shape[0]
    # distinct fill per padded row so padding never matches anything
    if n_pad != n:
        padded[n:] = (
            np.arange(1, n_pad - n + 1, dtype=np.uint32)[:, None]
            + np.uint32(0x7FFFFFFF)
        )

    def block(rows_block, cols_block):
        eq = (
            rows_block[:, None, :] == cols_block[None, :, :]
        )  # [nr, nc, H], fused into the reduce
        counts = jnp.sum(eq, axis=-1, dtype=jnp.int32)
        # counts <= H: narrow on device so the dominant device->host
        # fetch shrinks 4x/2x (value-exact; widened back below)
        if h <= 255:
            return counts.astype(jnp.uint8)
        if h < 32768:
            return counts.astype(jnp.int16)
        return counts

    fn = shard_map(
        block,
        mesh=mesh,
        in_specs=(P(ROWS, None), P(COLS, None)),
        out_specs=P(ROWS, COLS),
    )
    out = jax.jit(fn)(
        _put(padded, mesh, P(ROWS, None)),
        _put(padded, mesh, P(COLS, None)),
    )
    return _fetch_global(out)[:n, :n].astype(np.int32)


def sharded_minhash_similarity(
    ascii_tokens: np.ndarray,
    lengths: np.ndarray,
    *,
    k: int = 4,
    n_hash: int = 50,
    seed: int = 0,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Full MinHash similarity on a mesh: data-parallel signature build +
    2-D-sharded agreement.  Returns float64 [N, N]."""
    from ..ops.minhash import minhash_signatures

    if mesh is None:
        mesh = make_mesh()
    # signature build is embarrassingly parallel over sequences: shard rows
    n = ascii_tokens.shape[0]
    ndev = mesh.devices.size
    padded_tokens = _pad_rows(np.asarray(ascii_tokens, np.uint8), ndev)
    padded_lengths = _pad_rows(np.asarray(lengths, np.int32), ndev)
    flat = Mesh(mesh.devices.reshape(-1), ("seq",))
    tok_dev = _put(padded_tokens, flat, P("seq"))
    len_dev = _put(padded_lengths, flat, P("seq"))
    sigs = minhash_signatures(
        tok_dev, len_dev, k=k, n_hash=n_hash, seed=seed,
        chunk=max(padded_tokens.shape[0], 1),
    )
    sigs = _fetch_global(sigs)[:n]
    counts = sharded_signature_agreement(sigs, mesh)
    sims = counts.astype(np.float64) / float(n_hash)
    np.fill_diagonal(sims, 1.0)
    return sims


# how many pair tiles each device folds into one kernel launch inside
# the sharded sweep (bounds the per-launch scoring-input HBM footprint;
# the Pallas grid's tile axis runs them back-to-back in one dispatch).
# Probed on-chip at h3n2 scale, n=1000, same relay window (round 4):
# group=8 80.2k pairs/s, group=16 44.7k, group=32 44.9k — larger
# launches serialize the per-group scoring-input production against the
# sweep instead of interleaving them.  DYNAALIGN_NW_GROUP re-probes.
import os as _os

_SHARDED_GROUP = int(_os.environ.get("DYNAALIGN_NW_GROUP", "8"))

# (matches << 13) | length packing for the fetched result blocks —
# the same 13-bit budget as the Pallas kernel's in-flight stats
# (ops/nw_pallas.py); eligible whenever padded m + n < 8192
_PACK_BITS = 13
_PACK_MASK = (1 << _PACK_BITS) - 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "tile", "gap_open", "gap_ext", "backend", "score_i16",
        "group", "pack", "min_split",
    ),
)
def _nw_tiles_sharded(
    seq_idx: jnp.ndarray,  # int32 [N, L] (replicated)
    lengths: jnp.ndarray,  # int32 [N]
    sub: jnp.ndarray,  # int32 [32, 32]
    tile_rows: jnp.ndarray,  # int32 [T, t] sequence ids per tile (row side)
    tile_cols: jnp.ndarray,  # int32 [T, t]
    *,
    mesh: Mesh,
    tile: int,
    gap_open: int,
    gap_ext: int,
    backend: str = "auto",
    score_i16: bool = False,
    group: int = _SHARDED_GROUP,
    pack: bool = False,
    min_split: int = 1,
):
    """Sweep T pair-tiles over the flattened mesh; T % (ndev*group) == 0.

    Each device runs the SAME stacked/banded/i16 Pallas sweep as the
    single-chip driver (``nw_batch_tiled``), ``group`` tiles per launch,
    so per-chip throughput matches the direct path.  Returns
    (matches, length) int32 [T, t, t] — or, with ``pack`` (eligible
    when m+n < 8192), ONE int32 [T, t, t] of (matches << 13) | length:
    the device->host fetch is the second-largest cost of a full-set
    sweep under the TPU relay, and packing halves it.
    """

    def device_fn(seqs, lens, submat, t_rows, t_cols):
        # t_rows: [T/ndev, t] local tile list, regrouped into stacks of
        # `group` tiles; each stack is ONE tiled-kernel launch
        def one_group(args):
            rows, cols = args  # [group, t]
            a = jnp.take(seqs, rows.reshape(-1), axis=0).reshape(
                group, tile, -1
            )
            la = jnp.take(lens, rows.reshape(-1)).reshape(group, tile)
            b = jnp.take(seqs, cols.reshape(-1), axis=0).reshape(
                group, tile, -1
            )
            lb = jnp.take(lens, cols.reshape(-1)).reshape(group, tile)
            res = nw_batch_tiled(
                jnp.repeat(a, tile, axis=1),
                jnp.repeat(la, tile, axis=1),
                jnp.tile(b, (1, tile, 1)),
                jnp.tile(lb, (1, tile)),
                submat,
                gap_open=gap_open, gap_ext=gap_ext, backend=backend,
                score_i16=score_i16, min_split=min_split,
            )
            mt = res.matches.reshape(group, tile, tile)
            ln = res.length.reshape(group, tile, tile)
            if pack:
                return (mt << _PACK_BITS) | ln
            return mt, ln

        t_local = t_rows.shape[0]
        g_rows = t_rows.reshape(t_local // group, group, tile)
        g_cols = t_cols.reshape(t_local // group, group, tile)
        out = jax.lax.map(one_group, (g_rows, g_cols))
        if pack:
            return out.reshape(t_local, tile, tile)
        return (
            out[0].reshape(t_local, tile, tile),
            out[1].reshape(t_local, tile, tile),
        )

    flat = Mesh(mesh.devices.reshape(-1), ("d",))
    fn = shard_map(
        device_fn,
        mesh=flat,
        in_specs=(P(), P(), P(), P("d"), P("d")),
        out_specs=P("d") if pack else (P("d"), P("d")),
        # the scan carry inits inside the NW kernel are mesh-invariant
        # constants; skip the varying-axis equality check
        check_vma=False,
    )
    return fn(seq_idx, lengths, sub, tile_rows, tile_cols)


def plan_nw_allpairs(
    n: int, tile: int, ndev: int, max_tiles_per_dispatch: int = 1024
):
    """The exact tile schedule sharded_nw_allpairs executes.

    Returns (tiles, order, inv_order, group, seg): the padded
    upper-triangle tile list (dummy tiles recompute tile 0), the
    within-segment device interleave, its inverse, the per-launch group
    size and the per-dispatch segment length.  Factored out so the
    load-balance stats/tests measure the REAL schedule, not a replica
    (SURVEY.md §7 hard part 6; the OpenMP loop it replaces is
    src/minHash.cpp:164-167).
    """
    nb = -(-n // tile)
    tiles = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    group = min(_SHARDED_GROUP, max(len(tiles) // ndev, 1))
    while len(tiles) % (ndev * group):
        tiles.append((0, 0))
    quantum = ndev * group
    seg = min(
        len(tiles), max(max_tiles_per_dispatch // quantum, 1) * quantum
    )
    while len(tiles) % seg:
        tiles.append((0, 0))
    n_tiles_padded = len(tiles)
    order = np.concatenate([
        s * seg + np.argsort(np.arange(seg) % ndev, kind="stable")
        for s in range(n_tiles_padded // seg)
    ])
    inv_order = np.argsort(order, kind="stable")
    return tiles, order, inv_order, group, seg


def nw_allpairs_schedule_stats(
    n: int, tile: int, ndev: int, max_tiles_per_dispatch: int = 1024
) -> dict:
    """Static per-device load statistics for the uniform NW schedule.

    Every tile costs the same on device (equal padded [tile, tile]
    shape), so balance is exactly the per-device tile-count spread.
    ``pad_efficiency`` is the fraction of computed pair slots that are
    real upper-triangle pairs (the rest: dummy tiles, sub-triangle
    halves of diagonal tiles, and index padding past n).
    """
    tiles, order, _, group, seg = plan_nw_allpairs(
        n, tile, ndev, max_tiles_per_dispatch
    )
    n_tiles = len(tiles)
    # device of each reordered position: shard_map splits the tile axis
    # into ndev contiguous chunks per segment
    per_dev = np.zeros(ndev, dtype=np.int64)
    chunk = seg // ndev
    for s in range(n_tiles // seg):
        for d in range(ndev):
            per_dev[d] += chunk
    real_pairs = n * (n + 1) // 2
    total_slots = n_tiles * tile * tile
    return {
        "ndev": ndev,
        "tiles_per_device": per_dev.tolist(),
        "tile_spread": int(per_dev.max() - per_dev.min()),
        "balance": float(per_dev.mean() / per_dev.max()),
        "pad_efficiency": real_pairs / total_slots,
        "n_tiles": n_tiles,
        "segments": n_tiles // seg,
        "group": group,
    }


def sharded_nw_allpairs(
    seq_idx: np.ndarray,
    lengths: np.ndarray,
    sub: np.ndarray,
    *,
    tile: int = 16,
    gap_open: int = 10,
    gap_ext: int = 4,
    mesh: Mesh | None = None,
    backend: str = "auto",
    max_tiles_per_dispatch: int | None = None,
    progress: bool = False,
) -> np.ndarray:
    """All-pairs NW percent-identity on a mesh.  Returns float64 [N, N].

    The upper-triangular tile grid (including diagonal tiles, mirroring
    the reference driver src/pairwiseSeqAlign.cpp:340-352) is round-robin
    assigned across devices; each device runs the batched wavefront DP
    over its tiles.  ``max_tiles_per_dispatch`` (default 1024, env
    DYNAALIGN_NW_SEG) caps how many tiles one XLA program sweeps
    (~2.5 s of device time per dispatch at h3n2 scale): sweeps dispatch
    several identically-shaped programs that pipeline back-to-back —
    bounding per-RPC duration AND overlapping each segment's packed
    fetch with the next segment's compute.
    """
    if max_tiles_per_dispatch is None:
        import os

        max_tiles_per_dispatch = int(
            os.environ.get("DYNAALIGN_NW_SEG", "1024")
        )
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    n = seq_idx.shape[0]
    nb = -(-n // tile)

    # the tile schedule: padded upper-triangle list, device interleave
    # within each same-shaped dispatch segment (plan_nw_allpairs is the
    # single source of truth — the load-balance stats/tests measure it)
    tiles, order, inv_order, group, seg = plan_nw_allpairs(
        n, tile, ndev, max_tiles_per_dispatch
    )
    t_arr = np.asarray(tiles, dtype=np.int32)[order]
    n_tiles_padded = len(tiles)

    ids = np.arange(nb * tile, dtype=np.int32) % n
    tile_rows = ids.reshape(nb, tile)[t_arr[:, 0]]
    tile_cols = ids.reshape(nb, tile)[t_arr[:, 1]]

    flat = Mesh(mesh.devices.reshape(-1), ("d",))
    chosen = pick_nw_backend(
        seq_idx.shape[1], seq_idx.shape[1], backend, bsz=tile * tile
    )
    i16 = chosen.startswith("pallas") and nw_i16_ok(
        seq_idx.shape[1], seq_idx.shape[1], gap_open, gap_ext, sub
    )
    seq_dev = _put(np.asarray(seq_idx, np.int32), flat, P())
    len_dev = _put(np.asarray(lengths, np.int32), flat, P())
    sub_dev = _put(np.asarray(sub, np.int32), flat, P())
    pack = 2 * seq_idx.shape[1] < (1 << _PACK_BITS)

    def sweep(min_split):
        pend = []
        n_disp = n_tiles_padded // seg
        for s in range(0, n_tiles_padded, seg):
            if progress:
                # coarse per-dispatch progress (the fused path's
                # analogue of the direct driver's per-launch lines);
                # dispatch is async, so this marks enqueue, not finish
                print(
                    f"nw: dispatch {s // seg + 1}/{n_disp} "
                    f"({seg} tiles each)",
                    flush=True,
                )
            pend.append(_nw_tiles_sharded(
                seq_dev,
                len_dev,
                sub_dev,
                _put(tile_rows[s : s + seg], flat, P("d")),
                _put(tile_cols[s : s + seg], flat, P("d")),
                mesh=mesh,
                tile=tile,
                gap_open=gap_open,
                gap_ext=gap_ext,
                backend=chosen,
                score_i16=i16,
                group=group,
                pack=pack,
                min_split=min_split,
            ))
        if pack:
            packed = np.concatenate(
                [_fetch_global(p) for p in pend]
            )[inv_order]
            return packed >> _PACK_BITS, packed & _PACK_MASK
        return (
            np.concatenate([_fetch_global(p[0]) for p in pend])[
                inv_order
            ],
            np.concatenate([_fetch_global(p[1]) for p in pend])[
                inv_order
            ],
        )

    # scoped-VMEM headroom is not uniform across the relay pool: the
    # same kernel shape has measured 12-19 MB of Mosaic stack against a
    # 16 MB limit depending on which terminal compiles it.  On a
    # scoped-VMEM compile failure, retry with a forced lane-batch split
    # (new shapes -> fresh compile at half the per-launch scratch).
    mt = ln = None
    for min_split in (1, 2, 4):
        try:
            mt, ln = sweep(min_split)
            break
        except jax.errors.JaxRuntimeError as e:
            msg = str(e).lower()
            if "vmem" not in msg or min_split == 4:
                raise
            import warnings

            warnings.warn(
                "scoped-VMEM compile failure; retrying the NW sweep "
                f"with lane-batch split {min_split * 2}"
            )

    matches = np.zeros((nb * tile, nb * tile), dtype=np.int64)
    length = np.zeros_like(matches)
    for (bi, bj), m_blk, l_blk in zip(tiles, mt, ln):
        sl_i = slice(bi * tile, (bi + 1) * tile)
        sl_j = slice(bj * tile, (bj + 1) * tile)
        matches[sl_i, sl_j] = m_blk
        length[sl_i, sl_j] = l_blk
    matches = matches[:n, :n]
    length = length[:n, :n]
    iu = np.triu_indices(n)
    sims = np.zeros((n, n), dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        vals = matches[iu].astype(np.float64) / length[iu]
    sims[iu] = vals
    sims.T[iu] = vals
    return sims


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "batch", "gap_open", "gap_ext", "backend", "score_i16",
        "group", "pack", "min_split",
    ),
)
def _nw_pairs_sharded(
    seq_a: jnp.ndarray,  # int32 [Na, La] (replicated)
    len_a: jnp.ndarray,  # int32 [Na]
    seq_b: jnp.ndarray,  # int32 [Nb, Lb]
    len_b: jnp.ndarray,  # int32 [Nb]
    sub: jnp.ndarray,  # int32 [32, 32]
    rows: jnp.ndarray,  # int32 [T, batch] row ids per pair batch
    cols: jnp.ndarray,  # int32 [T, batch]
    *,
    mesh: Mesh,
    batch: int,
    gap_open: int,
    gap_ext: int,
    backend: str,
    score_i16: bool = False,
    group: int = _SHARDED_GROUP,
    pack: bool = False,
    min_split: int = 1,
):
    """Sweep T explicit-pair batches over the flattened mesh;
    T % (ndev*group) == 0.

    Per-device compute goes through the same stacked/banded/i16 tiled
    kernel as the single-chip bucketed driver.  Returns (matches,
    length) int32 [T, batch], or one packed (matches << 13) | length
    array with ``pack`` (halves the relay fetch; m+n < 8192 only).
    """

    def device_fn(sa, la, sb, lb, submat, r, c):
        def one_group(args):
            rr, cc = args  # [group, batch]
            res = nw_batch_tiled(
                jnp.take(sa, rr.reshape(-1), axis=0).reshape(
                    group, batch, -1
                ),
                jnp.take(la, rr.reshape(-1)).reshape(group, batch),
                jnp.take(sb, cc.reshape(-1), axis=0).reshape(
                    group, batch, -1
                ),
                jnp.take(lb, cc.reshape(-1)).reshape(group, batch),
                submat,
                gap_open=gap_open, gap_ext=gap_ext, backend=backend,
                score_i16=score_i16, min_split=min_split,
            )
            if pack:
                return (res.matches << _PACK_BITS) | res.length
            return res.matches, res.length

        t_local = r.shape[0]
        out = jax.lax.map(
            one_group,
            (
                r.reshape(t_local // group, group, batch),
                c.reshape(t_local // group, group, batch),
            ),
        )
        if pack:
            return out.reshape(t_local, batch)
        return (
            out[0].reshape(t_local, batch),
            out[1].reshape(t_local, batch),
        )

    flat = Mesh(mesh.devices.reshape(-1), ("d",))
    fn = shard_map(
        device_fn,
        mesh=flat,
        in_specs=(P(), P(), P(), P(), P(), P("d"), P("d")),
        out_specs=P("d") if pack else (P("d"), P("d")),
        check_vma=False,
    )
    return fn(seq_a, len_a, seq_b, len_b, sub, rows, cols)


def sharded_nw_allpairs_bucketed(
    sequences,
    sub: np.ndarray,
    *,
    bucket_edges=None,
    batch: int = 256,
    gap_open: int = 10,
    gap_ext: int = 4,
    mesh: Mesh | None = None,
    backend: str = "auto",
) -> np.ndarray:
    """Length-bucketed all-pairs NW on a device mesh (SURVEY.md §7 hard
    part 6: schedule pair work by its m_i*m_j area cost, not worst-case
    padding).

    Sequences are grouped into padded length buckets; every (bucket_a,
    bucket_b) pair group is computed at its own padded shape and its
    pair batches are round-robined across the flattened mesh.  Within a
    group every batch costs the same (equal padded area), so each
    group's sweep is load-balanced by construction; groups are processed
    largest-area-first so the expensive shapes overlap compile/dispatch
    of the cheap ones.  Bit-identical to api.similarity_nw (orientation
    preserved: the smaller global index is sequence1,
    src/pairwiseSeqAlign.cpp:340-343).

    Returns float64 [N, N].
    """
    from ..api import PALLAS_BUCKET_EDGES
    from ..encode import bucket_by_length

    seqs = list(sequences)
    n = len(seqs)
    if n == 0:
        raise ValueError("Input sequences vector cannot be empty")
    if mesh is None:
        mesh = make_mesh()
    ndev = mesh.devices.size
    flat = Mesh(mesh.devices.reshape(-1), ("d",))
    # default to the Pallas-aligned edges ((edge+1) % 8 == 0) —
    # bucket_by_length's own power-of-two defaults would make every
    # bucket shape Pallas-ineligible and silently drop each group to
    # the scan backend on TPU
    if bucket_edges is None:
        bucket_edges = PALLAS_BUCKET_EDGES
    buckets = bucket_by_length(seqs, bucket_edges=tuple(bucket_edges))
    which = np.zeros(n, dtype=np.int64)
    local = np.zeros(n, dtype=np.int64)
    devs = []
    for b, (pos, enc_b) in enumerate(buckets):
        which[pos] = b
        local[pos] = np.arange(len(pos))
        devs.append((
            _put(np.asarray(enc_b.indices, np.int32), flat, P()),
            _put(np.asarray(enc_b.lengths, np.int32), flat, P()),
        ))
    sub_dev = _put(np.asarray(sub, np.int32), flat, P())

    iu = np.triu_indices(n)  # ordered pairs incl. diagonal
    groups: dict[tuple[int, int], list[int]] = {}
    for p, (gi, gj) in enumerate(zip(iu[0], iu[1])):
        groups.setdefault(
            (int(which[gi]), int(which[gj])), []
        ).append(p)

    # largest padded area first (m_i * m_j cost model)
    def area(key):
        ba, bb = key
        return buckets[ba][1].max_len * buckets[bb][1].max_len

    matches = np.zeros((n, n), dtype=np.int64)
    length = np.zeros((n, n), dtype=np.int64)
    pending = []
    for key in sorted(groups, key=area, reverse=True):
        ba, bb = key
        plist = groups[key]
        gi = iu[0][plist]
        gj = iu[1][plist]
        rows = local[gi].astype(np.int32)
        cols = local[gj].astype(np.int32)
        npairs = len(rows)
        # whole [T, batch] grid with T a device multiple (padding pairs
        # recompute pair 0 of the group — cheap, discarded).  The batch
        # size is chosen per group to minimise padded slots: the grid
        # quantum is ndev * batch_g pairs, so small groups take smaller
        # batches (each batch size is one extra compiled shape, but the
        # candidate set is tiny and shared across groups).
        pallas_ok = pick_nw_backend(
            buckets[ba][1].max_len, buckets[bb][1].max_len, backend,
            bsz=128,
        ).startswith("pallas")
        batch_g, t_batches, group_g = plan_bucket_group(
            npairs, ndev, batch, pallas_ok
        )
        pad = t_batches * batch_g
        rows = np.pad(rows, (0, pad - npairs)).reshape(
            t_batches, batch_g
        )
        cols = np.pad(cols, (0, pad - npairs)).reshape(
            t_batches, batch_g
        )
        # interleave so each device gets an even spread
        order = np.argsort(
            np.arange(t_batches) % ndev, kind="stable"
        )
        inv_order = np.argsort(order, kind="stable")
        seq_a, len_a = devs[ba]
        seq_b, len_b = devs[bb]
        m_a = buckets[ba][1].max_len
        m_b = buckets[bb][1].max_len
        chosen = pick_nw_backend(m_a, m_b, backend, bsz=batch_g)
        i16 = chosen.startswith("pallas") and nw_i16_ok(
            m_a, m_b, gap_open, gap_ext, sub
        )
        pack = m_a + m_b < (1 << _PACK_BITS)
        # per-group scoped-VMEM retry (see sharded_nw_allpairs: the
        # relay pool's limit/measurement is not uniform across terminals)
        for ms in (1, 2, 4):
            try:
                out = _nw_pairs_sharded(
                    seq_a, len_a, seq_b, len_b, sub_dev,
                    _put(rows[order], flat, P("d")),
                    _put(cols[order], flat, P("d")),
                    mesh=mesh, batch=batch_g, gap_open=gap_open,
                    gap_ext=gap_ext,
                    backend=chosen,
                    score_i16=i16,
                    group=group_g,
                    pack=pack,
                    min_split=ms,
                )
                break
            except jax.errors.JaxRuntimeError as e:
                if "vmem" not in str(e).lower() or ms == 4:
                    raise
                import warnings

                warnings.warn(
                    "scoped-VMEM compile failure; retrying bucket "
                    f"group with lane-batch split {ms * 2}"
                )
        pending.append((gi, gj, npairs, inv_order, pack, out))
    for gi, gj, npairs, inv_order, pack, out in pending:
        if pack:
            packed = _fetch_global(out)[inv_order].reshape(-1)[:npairs]
            mt = packed >> _PACK_BITS
            ln = packed & _PACK_MASK
        else:
            mt = _fetch_global(out[0])[inv_order].reshape(-1)[:npairs]
            ln = _fetch_global(out[1])[inv_order].reshape(-1)[:npairs]
        matches[gi, gj] = mt
        length[gi, gj] = ln
        matches[gj, gi] = mt
        length[gj, gi] = ln
    with np.errstate(invalid="ignore", divide="ignore"):
        return matches.astype(np.float64) / length


def sharded_minhash_topk(
    sigs: np.ndarray,
    k: int = 64,
    *,
    mesh: Mesh | None = None,
    block: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """Top-k neighbor lists on a device mesh (the sparse large-N path's
    distributed form): row blocks sharded over the flattened mesh,
    signatures replicated, each device reducing its rows' agreement
    counts to top-k locally — no [N, N] anywhere, no collectives
    (outputs are row-sharded and fetched once).

    Byte-identical to the single-device ops.topk_graph.minhash_topk
    (tests/test_parallel.py): same f32 top_k, same self-mask, same
    phantom-neighbor cleanup.

    Returns (similarities float64 [N, k], neighbor idx int32 [N, k]).
    """
    if mesh is None:
        mesh = make_mesh()
    flat = Mesh(mesh.devices.reshape(-1), ("d",))
    ndev = flat.devices.size
    sigs = np.asarray(sigs, dtype=np.uint32)
    n, n_hash = sigs.shape
    k = min(k, max(n - 1, 1))
    quantum = ndev * block
    n_pad = -(-n // quantum) * quantum
    padded = sigs
    if n_pad != n:
        fill = (
            np.arange(1, n_pad - n + 1, dtype=np.uint32)[:, None]
            + np.uint32(0x7FFFFFFF)
        ) * np.ones((1, n_hash), dtype=np.uint32)
        padded = np.concatenate([sigs, fill], axis=0)
    rows_per_dev = n_pad // ndev
    cdt = jnp.int8 if n_hash <= 127 else jnp.int32

    def device_fn(local, full):
        # local: [rows_per_dev, H] this device's row shard; full: [N, H]
        offset = jax.lax.axis_index("d") * rows_per_dev

        def row_block(i, acc):
            vals_acc, idx_acc = acc
            blk = jax.lax.dynamic_slice(
                local, (i * block, 0), (block, n_hash)
            )
            eq = blk[:, None, :] == full[None, :, :]
            counts = jnp.sum(eq, axis=-1, dtype=cdt)
            row_ids = (
                offset + i * block
                + jnp.arange(block, dtype=jnp.int32)
            )
            col_ids = jnp.arange(n_pad, dtype=jnp.int32)
            counts = jnp.where(
                col_ids[None, :] == row_ids[:, None], cdt(-1), counts
            )
            fvals, idx = jax.lax.top_k(counts.astype(jnp.float32), k)
            vals_acc = jax.lax.dynamic_update_slice(
                vals_acc, fvals.astype(jnp.int32), (i * block, 0)
            )
            idx_acc = jax.lax.dynamic_update_slice(
                idx_acc, idx.astype(jnp.int32), (i * block, 0)
            )
            return vals_acc, idx_acc

        vals0 = jnp.zeros((rows_per_dev, k), dtype=jnp.int32)
        idx0 = jnp.zeros((rows_per_dev, k), dtype=jnp.int32)
        return jax.lax.fori_loop(
            0, rows_per_dev // block, row_block, (vals0, idx0)
        )

    fn = shard_map(
        device_fn,
        mesh=flat,
        in_specs=(P("d"), P()),
        out_specs=(P("d"), P("d")),
        check_vma=False,
    )
    vals_dev, idx_dev = jax.jit(fn)(
        _put(padded, flat, P("d")), _put(padded, flat, P())
    )
    vals = _fetch_global(vals_dev)[:n].astype(np.float64) / float(n_hash)
    idx = np.array(_fetch_global(idx_dev))[:n]
    phantom = idx >= n
    vals[phantom] = 0.0
    idx[phantom] = 0
    return vals, idx
