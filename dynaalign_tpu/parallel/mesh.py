"""Device-mesh construction and (multi-host) runtime initialization.

The reference's entire parallel runtime is an OpenMP pragma
(src/Makevars:1-2).  The TPU-native equivalent (SURVEY.md §5
"Distributed communication backend"): ``jax.distributed`` +
GSPMD/shard_map over a ``jax.sharding.Mesh``.  The all-pairs similarity
matrix is decomposed over a 2-D (rows x cols) mesh — each device owns an
[N/pr, N/pc] block of the output; the sequence/signature set is small and
replicated, so the only collectives are the input broadcast and the final
block gather, keeping cross-chip traffic on ICI thin by design.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec

ROWS, COLS = "rows", "cols"


def distributed_init(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed for multi-host runs (no-op on 1 host).

    Reads JAX_COORDINATOR / JAX_NUM_PROCESSES / JAX_PROCESS_ID when args
    are omitted; silently skips when unset (single-host).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=(
            num_processes
            if num_processes is not None
            else int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        ),
        process_id=(
            process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0"))
        ),
    )


def _near_square_factors(n: int) -> tuple[int, int]:
    r = int(np.floor(np.sqrt(n)))
    while n % r:
        r -= 1
    return r, n // r


def make_mesh(
    devices=None, n_devices: int | None = None
) -> Mesh:
    """2-D (rows x cols) mesh over the given or all available devices.

    The factorization is as near-square as the device count allows:
    8 -> 2x4, 4 -> 2x2, 1 -> 1x1.  On real slices the default device
    order follows the physical torus so both axes ride ICI.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    r, c = _near_square_factors(len(devices))
    arr = np.asarray(devices).reshape(r, c)
    return Mesh(arr, (ROWS, COLS))


def replicated(mesh: Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, PartitionSpec())


def row_sharded(mesh: Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, PartitionSpec(ROWS))


def block_sharded(mesh: Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, PartitionSpec(ROWS, COLS))
