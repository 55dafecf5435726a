"""Worker for the 2-process jax.distributed test (run via subprocess).

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the launcher);
``distributed_init`` wires them into one 8-device global runtime.  The
worker runs the full sharded MinHash all-pairs path and a sharded NW
sweep over the global mesh and checks both against the single-process
C++ oracle values, exercising the true multi-process code path
(SURVEY.md §5 distributed backend; the reference has no analogue —
src/Makevars:1-2 is its entire parallel runtime).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    import jax

    from dynaalign_tpu.parallel import distributed_init

    distributed_init()  # reads JAX_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    import numpy as np

    from dynaalign_tpu import blosum, encode, oracle
    from dynaalign_tpu.parallel import (
        make_mesh,
        sharded_minhash_similarity,
        sharded_nw_allpairs,
    )

    rng = np.random.default_rng(7)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    seqs = [
        "".join(rng.choice(aas, size=int(n)))
        for n in rng.integers(18, 40, 24)
    ]
    enc = encode.encode(seqs, pad_multiple=8)
    mesh = make_mesh()  # spans both processes' devices
    assert mesh.devices.size == 8

    mh = sharded_minhash_similarity(
        enc.ascii, enc.lengths, k=3, n_hash=32, seed=0, mesh=mesh
    )
    want_mh = oracle.minhash_similarity(seqs, k=3, n_hash=32, seed=0)
    assert np.array_equal(mh, want_mh), "MH multi-process mismatch"

    nw = sharded_nw_allpairs(
        enc.indices, enc.lengths, blosum.get_matrix("BLOSUM62"),
        tile=4, mesh=mesh,
    )
    want_nw = oracle.nw_similarity(seqs)
    assert np.array_equal(nw, want_nw), "NW multi-process mismatch"

    # round 5: the sharded top-k reduction under the 2-process mesh
    # must reproduce the dense MH matrix's per-row strongest neighbors
    from dynaalign_tpu.ops.minhash import minhash_signatures
    from dynaalign_tpu.parallel import sharded_minhash_topk

    sigs = np.asarray(minhash_signatures(
        enc.ascii, enc.lengths, k=3, n_hash=32, seed=0
    ))
    tv, ti = sharded_minhash_topk(sigs, k=3, mesh=mesh)
    masked = want_mh - 2.0 * np.eye(len(seqs))  # exclude self like top-k
    assert np.array_equal(
        np.sort(tv, axis=1)[:, ::-1],
        np.sort(masked, axis=1)[:, ::-1][:, :3],
    ), "top-k multi-process values mismatch"

    print(f"proc {jax.process_index()} OK", flush=True)


if __name__ == "__main__":
    main()
