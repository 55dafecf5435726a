"""Benchmark harness smoke tests (small limits, CPU mesh)."""

import json
import sys

import pytest


def _run(capsys, argv):
    sys.path.insert(0, "benchmarks")
    from benchmarks.run_benchmarks import main

    rc = main(argv)
    assert rc == 0
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    return [json.loads(ln) for ln in lines]


def test_mh_quickstart_bench(capsys):
    (res,) = _run(capsys, ["--bench", "mh_quickstart", "--mh-limit", "80"])
    assert res["metric"] == "mh_quickstart_pairs_per_sec"
    assert res["bit_exact"] is True
    assert res["value"] > 0


def test_nw_bench(capsys):
    (res,) = _run(
        capsys,
        ["--bench", "nw_h3n2", "--nw-limit", "8", "--baseline-limit", "8"],
    )
    assert res["metric"] == "nw_h3n2_pairs_per_sec"
    assert res["bit_exact"] is True


def test_scaling_bench(capsys):
    (res,) = _run(
        capsys,
        ["--bench", "scaling", "--scale-n", "256", "--scale-reps", "1"],
    )
    # CPU test env uses virtual shared-core devices -> overhead metric
    assert res["metric"] == "scaling_partition_overhead"
    assert set(res["rate_ratio"]) >= {"1", "8"}
    assert set(res["linear_efficiency_if_real_chips"]) >= {"1", "8"}
