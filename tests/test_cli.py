"""CLI end-to-end: similarity -> cluster -> consensus on temp files."""

import csv

import numpy as np

from dynaalign_tpu.cli import main
from dynaalign_tpu.io.seqio import read_fasta, read_sequences, write_fasta


def _write_inputs(tmp_path, rng):
    aas = list("ARNDCQEGHILKMFPSTWYV")
    bases = ["".join(rng.choice(aas, size=14)) for _ in range(3)]
    seqs = []
    for b in bases:
        for _ in range(8):
            s = list(b)
            s[rng.integers(14)] = aas[rng.integers(20)]
            seqs.append("".join(s))
    fa = tmp_path / "input.fasta"
    write_fasta(str(fa), [f"s{i}" for i in range(len(seqs))], seqs)
    return fa, seqs


def test_fasta_roundtrip(tmp_path):
    path = tmp_path / "x.fasta"
    write_fasta(str(path), ["a", "b"], ["ARND", "CQEG"])
    names, seqs = read_fasta(str(path))
    assert names == ["a", "b"] and seqs == ["ARND", "CQEG"]
    assert read_sequences(str(path)) == ["ARND", "CQEG"]


def test_cli_similarity_and_stats(tmp_path, rng, capsys):
    fa, seqs = _write_inputs(tmp_path, rng)
    out = tmp_path / "sim.npz"
    rc = main([
        "similarity", "--input", str(fa), "--engine", "mh",
        "--k", "2", "--n-hash", "32", "--output", str(out),
    ])
    assert rc == 0
    with np.load(out) as z:
        sim = z["similarity"]
    assert sim.shape == (len(seqs), len(seqs))
    rc = main(["stats", "--similarity", str(out)])
    assert rc == 0
    assert "mean_similarity" in capsys.readouterr().out


def test_cli_cluster_and_consensus(tmp_path, rng):
    fa, seqs = _write_inputs(tmp_path, rng)
    clusters = tmp_path / "clusters.csv"
    rc = main([
        "cluster", "--input", str(fa), "--engine", "mh", "--k", "2",
        "--n-hash", "64", "--thresh-p", "0.6", "--size-max", "15",
        "--size-min", "2", "--output", str(clusters),
    ])
    assert rc == 0
    rows = list(csv.DictReader(open(clusters)))
    assert len(rows) == len(seqs)
    consensus = tmp_path / "consensus.csv"
    rc = main([
        "consensus", "--clusters", str(clusters),
        "--output", str(consensus),
    ])
    assert rc == 0
    crows = list(csv.DictReader(open(consensus)))
    assert len(crows) >= 1
    assert all(r["consensus"] for r in crows)


def test_cli_pipeline_and_datasets(tmp_path, rng, capsys):
    fa, seqs = _write_inputs(tmp_path, rng)
    outdir = tmp_path / "out"
    rc = main([
        "pipeline", "--input", str(fa), "--engine", "mh", "--k", "2",
        "--n-hash", "64", "--thresh-p", "0.6", "--size-max", "15",
        "--size-min", "2", "--output-dir", str(outdir),
    ])
    assert rc == 0
    assert (outdir / "clusters.csv").exists()
    assert (outdir / "consensus.csv").exists()
    rc = main(["datasets"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "h3n2sample: 8103 rows" in out


def test_cli_warm(tmp_path, rng, capsys):
    import json

    fa, seqs = _write_inputs(tmp_path, rng)
    rc = main([
        "warm", "--input", str(fa), "--engines", "mh,nw", "--n", "8",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["warmed"] == ["mh", "nw"]
    assert out["n_seqs"] == 8
    assert set(out["stage_seconds"]) == {"mh", "nw"}


def test_cli_cluster_sparse_engines(tmp_path, rng, capsys):
    """topk and hybrid-sparse are flat large-N cluster engines: same
    CSV schema, integer cluster labels, no FILTERED rows; and the
    similarity subcommand rejects them with a clear message."""
    import pytest

    fa, seqs = _write_inputs(tmp_path, rng)
    for engine in ("topk", "hybrid-sparse"):
        out = tmp_path / f"{engine}.csv"
        rc = main([
            "cluster", "--input", str(fa), "--engine", engine,
            "--k", "2", "--top-k", "8", "--output", str(out),
        ])
        assert rc == 0
        with open(out) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == len(seqs)
        assert all(r["cluster"].isdigit() for r in rows)
        # the planted 3-motif structure is recovered as >= 2 clusters
        assert len({r["cluster"] for r in rows}) >= 2
    with pytest.raises(SystemExit, match="cluster"):
        main([
            "similarity", "--input", str(fa), "--engine", "topk",
            "--output", str(tmp_path / "x.npz"),
        ])
