"""Failure detection and clean multi-host abort.

The reference's failure surface is input validation via Rcpp::stop / R
stop() (SURVEY.md §5 "Failure detection"); there is no multi-process
runtime to tear down.  Here, a crashed host in a multi-host run would
leave the other hosts blocked in collectives until the RPC timeout; the
:func:`clean_abort` context manager converts an uncaught exception on any
host into a prompt, logged shutdown of the distributed runtime so the
whole job fails fast instead of hanging.

Elastic recovery is deliberately out of scope (batch workloads; SURVEY.md
§5) — resumability is provided one level up by clusterbreak checkpoints.
"""

from __future__ import annotations

import contextlib
import sys

import jax

from ..utils.logging import get_logger


@contextlib.contextmanager
def clean_abort(exit_code: int = 1):
    """Abort the distributed runtime cleanly on any uncaught exception.

    Usage:
        distributed_init()
        with clean_abort():
            run_job()
    """
    logger = get_logger()
    try:
        yield
    except KeyboardInterrupt:
        logger.warning("Interrupted; shutting down distributed runtime")
        _shutdown()
        raise
    except Exception as exc:  # noqa: BLE001 — this is the crash barrier
        logger.error(
            "Fatal error on process %s: %s",
            getattr(jax, "process_index", lambda: 0)(),
            exc,
        )
        _shutdown()
        if _is_multiprocess():
            # other hosts are (or will be) stuck in collectives; exiting
            # non-zero lets the launcher tear the job down
            sys.exit(exit_code)
        raise


def _is_multiprocess() -> bool:
    try:
        return jax.process_count() > 1
    except Exception:
        return False


def _shutdown() -> None:
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def check_devices_healthy() -> list[str]:
    """Lightweight device health probe: run a tiny computation on every
    addressable device; returns a list of failure descriptions (empty =
    healthy)."""
    import jax.numpy as jnp

    failures = []
    for dev in jax.local_devices():
        try:
            x = jax.device_put(jnp.ones((8, 128)), dev)
            if float(x.sum()) != 8 * 128:
                failures.append(f"{dev}: wrong result")
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{dev}: {exc}")
    return failures
