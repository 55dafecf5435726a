"""Persistent XLA compilation cache setup (cold-compile UX).

Pallas NW kernels are expensive to compile — the band-limited wavefront
carries 4 static width classes of the step body and a cold compile of
the ~566 aa h3n2 shape takes ~3-8 minutes on the axon TPU relay (and
Pallas under ``shard_map``/``lax.map`` can exceed that).  The reference
has no analogous cost: its C++ is compiled once at package install
(src/Makevars).  The TPU-native mitigation is JAX's persistent
compilation cache: every entry point (CLI, bench.py, benchmark harness)
calls :func:`enable_persistent_cache` before first compile, so any given
(shape, config) pays the compile exactly once per machine and loads from
disk in seconds thereafter.

Cache location: ``$DYNAALIGN_CACHE_DIR``, else ``<repo>/.jax_cache``
when running from a checkout, else ``~/.cache/dynaalign_tpu/jax``.
"""

from __future__ import annotations

import os

__all__ = ["enable_persistent_cache"]


def _default_cache_dir() -> str:
    env = os.environ.get("DYNAALIGN_CACHE_DIR")
    if env:
        return env
    # repo-local cache when running from a checkout (keeps bench/CLI/test
    # runs sharing one cache), else per-user
    pkg_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if os.path.isdir(os.path.join(pkg_root, ".git")) or os.path.exists(
        os.path.join(pkg_root, "pyproject.toml")
    ):
        return os.path.join(pkg_root, ".jax_cache")
    return os.path.join(
        os.path.expanduser("~"), ".cache", "dynaalign_tpu", "jax"
    )


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at a durable directory.

    Idempotent; safe to call before or after backend init (the config
    flags only affect compiles that happen after the call).  Returns the
    directory used.
    """
    import jax

    cache_dir = cache_dir or _default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist EVERYTHING: under the TPU relay even a sub-second compile
    # costs a multi-second remote RPC, so "trivial" executables are
    # exactly the ones a fresh process pays for over and over (measured:
    # 65k-seq signature build, first call 156s cold vs 0.5s hot — all
    # dispatch/compile RPCs, no compute)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # ... but bound the directory: caching every trivial executable with
    # no eviction would grow without limit across shape families.  4 GB
    # holds hundreds of Pallas NW shapes (the big banded h3n2 executable
    # is ~10 MB); JAX evicts least-recently-used entries past the cap.
    jax.config.update("jax_compilation_cache_max_size", 4 << 30)
    return cache_dir
