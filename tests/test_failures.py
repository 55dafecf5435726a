"""Failure-handling subsystem."""

import pytest

from dynaalign_tpu.parallel.failures import (
    check_devices_healthy,
    clean_abort,
)


def test_devices_healthy():
    assert check_devices_healthy() == []


def test_clean_abort_reraises_single_process():
    with pytest.raises(RuntimeError, match="boom"):
        with clean_abort():
            raise RuntimeError("boom")


def test_clean_abort_passthrough():
    with clean_abort():
        x = 1 + 1
    assert x == 2


def test_clean_abort_keyboard_interrupt():
    with pytest.raises(KeyboardInterrupt):
        with clean_abort():
            raise KeyboardInterrupt
