"""Extract the standard BLOSUM substitution tables from the reference C++ source.

The six BLOSUM matrices (45/50/62/80/90/100) are standard public substitution
tables (Henikoff & Henikoff 1992, distributed with NCBI BLAST).  The reference
hardcodes them at /root/reference/src/pairwiseSeqAlign.cpp:23-186; we extract
the numeric values programmatically (rather than retyping 3456 integers) and
emit them as a compact .npy bundle consumed by dynaalign_tpu.blosum.
"""

import re
import numpy as np

SRC = "/root/reference/src/pairwiseSeqAlign.cpp"
OUT = "/root/repo/dynaalign_tpu/_blosum_tables.npz"

text = open(SRC).read()
tables = {}
for m in re.finditer(r"const int (BLOSUM\d+)\[24\]\[24\] = \{(.*?)\};", text, re.S):
    name, body = m.group(1), m.group(2)
    rows = re.findall(r"\{([^{}]*)\}", body)
    assert len(rows) == 24, (name, len(rows))
    mat = np.array(
        [[int(v) for v in row.split(",")] for row in rows], dtype=np.int32
    )
    assert mat.shape == (24, 24), name
    # substitution matrices are symmetric
    assert (mat == mat.T).all(), name
    tables[name] = mat

assert sorted(tables) == [
    "BLOSUM100", "BLOSUM45", "BLOSUM50", "BLOSUM62", "BLOSUM80", "BLOSUM90",
]
np.savez_compressed(OUT, **tables)
print("wrote", OUT, "tables:", sorted(tables))
# sanity: BLOSUM62 well-known entries
b62 = tables["BLOSUM62"]
assert b62[0, 0] == 4 and b62[17, 17] == 11 and b62[4, 4] == 9
print("BLOSUM62 spot-check OK")
