"""Bundled datasets (converted from the reference's data/*.rda).

The reference lazy-loads nine .rda datasets (reference: data/*.rda,
SURVEY.md §6).  We convert them once to .npz (tools/convert_datasets.py)
and load them hermetically from the repo's data/ directory; if a
conversion is missing we fall back to parsing the original .rda via
:mod:`dynaalign_tpu.io.rda`.

Dataset roles (SURVEY.md §6):
  evp_peparray   641 peptide-array rows, PROBE_SEQUENCE 12-mers (quick start)
  h3n2sample     8,103 H3N2 HA proteins (~566 aa) with clade labels
  h3n2ha1415     11,517 H3N2 HA sequences (benchmark input)
  allunique      65,339 unique 12-mer peptides (large MH stress set)
  adenovirus/parvovirus/polyomavirus/mitochondria/herv  peparray panels
  herpesvirus    MISSING upstream (stripped large blob, .MISSING_LARGE_BLOBS)
"""

from __future__ import annotations

import os

import numpy as np

DATASETS = (
    "adenovirus",
    "allunique",
    "evp_peparray",
    "h3n2ha1415",
    "h3n2sample",
    "herv",
    "mitochondria",
    "parvovirus",
    "polyomavirus",
)

# canonical column holding the AA sequences per dataset
SEQUENCE_COLUMN = {
    "adenovirus": "PROBE_SEQUENCE",
    "allunique": "peptides",
    "evp_peparray": "PROBE_SEQUENCE",
    "h3n2ha1415": "sequence",
    "h3n2sample": "sequence",
    "herv": "PROBE_SEQUENCE",
    "mitochondria": "PROBE_SEQUENCE",
    "parvovirus": "PROBE_SEQUENCE",
    "polyomavirus": "PROBE_SEQUENCE",
}

_REPO_DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"
)
_REFERENCE_DATA = "/root/reference/data"


def load_dataset(name: str) -> dict[str, np.ndarray]:
    """Load a bundled dataset as {column: array}."""
    if name not in DATASETS:
        raise ValueError(f"unknown dataset {name!r}; available: {DATASETS}")
    npz_path = os.path.join(_REPO_DATA, f"{name}.npz")
    if os.path.exists(npz_path):
        with np.load(npz_path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    rda_path = os.path.join(_REFERENCE_DATA, f"{name}.rda")
    from .rda import load_rda, to_columns

    objs = load_rda(rda_path)
    (obj,) = objs.values()
    return to_columns(obj)


def load_sequences(name: str, limit: int | None = None) -> list[str]:
    """The dataset's AA sequence column as a list of python strings."""
    cols = load_dataset(name)
    seqs = cols[SEQUENCE_COLUMN[name]]
    out = [str(s) for s in seqs[:limit] if s is not None]
    return out
