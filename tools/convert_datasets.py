"""Convert the reference's data/*.rda to hermetic .npz bundles in data/.

String columns are stored as numpy unicode arrays (no pickling) so tests
and benchmarks never need the read-only reference mount at runtime.
"""

import os

import numpy as np

from dynaalign_tpu.io.rda import load_rda, to_columns
from dynaalign_tpu.io.datasets import DATASETS

SRC = "/root/reference/data"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")


def main():
    os.makedirs(DST, exist_ok=True)
    for name in DATASETS:
        objs = load_rda(os.path.join(SRC, f"{name}.rda"))
        (obj,) = objs.values()
        cols = to_columns(obj)
        clean = {}
        for k, v in cols.items():
            if v.dtype == object:
                v = np.array(
                    ["" if x is None else str(x) for x in v], dtype=np.str_
                )
            clean[k] = v
        out = os.path.join(DST, f"{name}.npz")
        np.savez_compressed(out, **clean)
        nrows = len(next(iter(clean.values())))
        print(f"{name}: {nrows} rows, {len(clean)} cols -> {out} "
              f"({os.path.getsize(out) // 1024} KiB)")


if __name__ == "__main__":
    main()
