"""Data layer: .rda parsing + converted dataset bundles.

Row counts are the ground truth extracted in SURVEY.md §6.
"""

import numpy as np
import pytest

from dynaalign_tpu.io.datasets import (
    DATASETS,
    SEQUENCE_COLUMN,
    load_dataset,
    load_sequences,
)

EXPECTED_ROWS = {
    "adenovirus": 4207,
    "allunique": 65339,
    "evp_peparray": 641,
    "h3n2ha1415": 11517,
    "h3n2sample": 8103,
    "herv": 5701,
    "mitochondria": 383,
    "parvovirus": 752,
    "polyomavirus": 663,
}


@pytest.mark.parametrize("name", DATASETS)
def test_dataset_shapes(name):
    cols = load_dataset(name)
    nrows = len(next(iter(cols.values())))
    assert nrows == EXPECTED_ROWS[name]
    assert SEQUENCE_COLUMN[name] in cols


def test_sequences_are_peptides():
    seqs = load_sequences("evp_peparray")
    assert len(seqs) == 641
    assert all(len(s) == 12 for s in seqs)  # 12-mer probes
    h3n2 = load_sequences("h3n2sample", limit=20)
    lens = [len(s) for s in h3n2]
    assert min(lens) > 300 and max(lens) < 800  # ~566 aa HA proteins


def test_h3n2_clades_present():
    cols = load_dataset("h3n2sample")
    clades = np.unique(cols["clade"])
    assert len(clades) > 1


def test_unknown_dataset():
    with pytest.raises(ValueError):
        load_dataset("nope")
