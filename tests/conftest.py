"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on XLA's host-platform virtual devices (the same GSPMD
partitioner TPU uses), per SURVEY.md §4/§7.

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon baked in, so the env var alone is too late here — the
platform must be overridden through jax.config before any backend is
initialized.  Set DYNAALIGN_TEST_TPU=1 to run the suite on the real chip
instead.
"""

import os

import jax

if os.environ.get("DYNAALIGN_TEST_TPU", "0") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


AA20 = "ARNDCQEGHILKMFPSTWYV"


def random_seqs(rng, n, lo, hi, alphabet=AA20):
    lens = rng.integers(lo, hi + 1, size=n)
    return [
        "".join(rng.choice(list(alphabet), size=ln)) for ln in lens
    ]


@pytest.fixture
def make_seqs(rng):
    def _make(n, lo, hi, alphabet=AA20):
        return random_seqs(rng, n, lo, hi, alphabet)

    return _make
