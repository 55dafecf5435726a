"""Probe the large-N top-k agreement sweep: layout + top_k variants.

The [N, k] neighbor sweep is 71% of the 100k cluster_large wall-clock
(docs/PERF.md config 5).  Hypotheses probed here:

1. layout: current eq-compare is [block, N, H] with H (=50, padded to
   128 lanes) minor — 2.6x lane waste.  Transposing signatures to
   [H, N] puts N (128-multiple) on lanes and H on sublanes.
2. top_k cost: lax.top_k sorts; lax.approx_max_k is the TPU-native
   alternative (deterministic, recall-bounded).

Usage: python tools/probe_topk.py [n_rows]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dynaalign_tpu.utils import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block", "variant"))
def sweep(sigs, sigs_t, *, k: int, block: int, variant: str):
    n, h = sigs.shape

    def row_block(i, acc):
        vals_acc, idx_acc = acc
        if variant.startswith("hminor"):
            blk = jax.lax.dynamic_slice(sigs, (i * block, 0), (block, h))
            eq = blk[:, None, :] == sigs[None, :, :]
            counts = jnp.sum(eq, axis=-1, dtype=jnp.int32)  # [block, N]
        else:  # nminor: N on lanes
            blk = jax.lax.dynamic_slice(sigs, (i * block, 0), (block, h))
            eq = blk[:, :, None] == sigs_t[None, :, :]  # [block, H, N]
            counts = jnp.sum(eq, axis=1, dtype=jnp.int32)  # [block, N]
        row_ids = i * block + jnp.arange(block, dtype=jnp.int32)
        col_ids = jnp.arange(n, dtype=jnp.int32)
        counts = jnp.where(
            col_ids[None, :] == row_ids[:, None], jnp.int32(-1), counts
        )
        if variant.endswith("approx"):
            fv, idx = jax.lax.approx_max_k(
                counts.astype(jnp.float32), k, recall_target=0.95
            )
            vals = fv.astype(jnp.int32)
        elif variant.endswith("approx99"):
            fv, idx = jax.lax.approx_max_k(
                counts.astype(jnp.float32), k, recall_target=0.99
            )
            vals = fv.astype(jnp.int32)
        elif variant.endswith("f32topk"):
            fv, idx = jax.lax.top_k(counts.astype(jnp.float32), k)
            vals = fv.astype(jnp.int32)
        elif variant.endswith("notopk"):
            vals = counts[:, :k]
            idx = jnp.broadcast_to(
                jnp.arange(k, dtype=jnp.int32)[None], (block, k)
            )
        else:
            vals, idx = jax.lax.top_k(counts, k)
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


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    h, k, block = 50, 32, 256
    rng = np.random.default_rng(0)
    # realistic agreement stats: low-cardinality values collide like
    # real minhash signatures do across near-duplicates
    sigs = rng.integers(0, 1 << 20, size=(n, h), dtype=np.uint32)
    sigs_d = jnp.asarray(sigs)
    sigs_t = jnp.asarray(sigs.T.copy())
    np.asarray(jnp.zeros(8) + 1)  # absorb relay warmup

    ref_vals = None
    for variant in ("hminor", "hminor_f32topk", "hminor_approx",
                    "hminor_approx99", "nminor_notopk"):
        try:
            t0 = time.perf_counter()
            vals, idx = sweep(
                sigs_d, sigs_t, k=k, block=block, variant=variant
            )
            vals = np.asarray(vals)
            first = time.perf_counter() - t0
        except Exception as e:
            print(f"{variant}: FAIL {type(e).__name__} {str(e)[:200]}")
            continue
        t0 = time.perf_counter()
        vals2, idx2 = sweep(
            sigs_d, sigs_t, k=k, block=block, variant=variant
        )
        vals2 = np.asarray(vals2)
        hot = time.perf_counter() - t0
        note = ""
        if variant == "hminor":
            ref_vals = np.sort(vals, axis=-1)
        elif ref_vals is not None and not variant.endswith("notopk"):
            agree = float(
                np.mean(np.sort(vals, axis=-1) == ref_vals)
            )
            note = f" value-agreement={agree:.4f}"
        print(
            f"{variant}: first={first:.2f}s hot={hot:.2f}s"
            f" ({n / hot:.0f} rows/s){note}",
            flush=True,
        )


if __name__ == "__main__":
    main()
