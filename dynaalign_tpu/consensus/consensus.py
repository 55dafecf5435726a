"""Consensus sequences from alignments; cluster_consensus driver.

Capability parity with the reference's ``clusterconsensus``
(R/clusterbreak.R:309-320), which runs
``DECIPHER::AlignSeqs`` + ``DECIPHER::ConsensusSequence`` per cluster.

Consensus policy (documented equivalent of ConsensusSequence's defaults,
threshold = 0.05, ambiguity = TRUE, for amino acids):

* per alignment column, characters with relative frequency <= ``threshold``
  are ignored;
* if gaps dominate the remaining mass (> 0.5), the column emits '-';
* a single surviving residue emits itself;
* a surviving set that is exactly a standard AA ambiguity group emits its
  IUPAC code: {N,D}→B, {Q,E}→Z, {I,L}→J;
* anything else emits 'X'.
"""

from __future__ import annotations

import numpy as np

from .msa import progressive_msa

_AMBIGUITY = {
    frozenset("ND"): "B",
    frozenset("QE"): "Z",
    frozenset("IL"): "J",
}


def consensus_sequence(
    aligned: list[str], threshold: float = 0.05
) -> str:
    """IUPAC consensus of equal-length gapped sequences."""
    if not aligned:
        return ""
    length = len(aligned[0])
    if any(len(s) != length for s in aligned):
        raise ValueError("aligned sequences must have equal length")
    n = len(aligned)
    cols = np.array([list(s) for s in aligned])
    out = []
    for c in range(length):
        col = cols[:, c]
        chars, counts = np.unique(col, return_counts=True)
        freqs = counts / n
        keep = freqs > threshold
        chars, freqs = chars[keep], freqs[keep]
        if len(chars) == 0:
            out.append("X")
            continue
        gap_mass = freqs[chars == "-"].sum()
        if gap_mass > 0.5:
            out.append("-")
            continue
        residues = [ch for ch in chars if ch != "-"]
        if len(residues) == 1:
            out.append(residues[0])
        else:
            code = _AMBIGUITY.get(frozenset(residues))
            out.append(code if code else "X")
    return "".join(out)


def cluster_consensus(
    df: np.ndarray | list[tuple[str, str]],
    *,
    matrix_name: str = "BLOSUM62",
    threshold: float = 0.05,
) -> np.ndarray:
    """Per-cluster MSA + consensus (reference clusterconsensus,
    R/clusterbreak.R:309-320).

    Args:
      df: [n, 2] array-like — column 0 sequences, column 1 cluster ids
        (the ``clustered_seq`` output of :func:`clusterbreak`).

    Returns:
      [m, 2] object array: (cluster_id, consensus_sequence), in first-seen
      cluster-id order (matching the reference's ``unique`` order).
    """
    arr = np.asarray(df, dtype=object)
    if arr.ndim != 2 or arr.shape[1] < 2:
        raise ValueError("df must be an [n, 2] (sequence, cluster) array")
    seen: list = []
    for cid in arr[:, 1]:
        if cid not in seen:
            seen.append(cid)
    rows = []
    for cid in seen:
        seqs = [str(s) for s in arr[arr[:, 1] == cid, 0]]
        aligned = progressive_msa(seqs, matrix_name=matrix_name)
        rows.append((cid, consensus_sequence(aligned, threshold)))
    return np.array(rows, dtype=object)
