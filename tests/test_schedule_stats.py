"""Load-balance invariants of the sharded NW schedules (round 5).

The BASELINE ">=80% scaling efficiency at 2+ hosts" target decomposes
as: (a) per-chip rate preserved under shard_map (measured on the real
chip every bench run: `fused_equals_direct` / the 1x1-mesh ratio), (b)
exactly equal per-device assigned work (the invariants below — the
planners are the SAME code the drivers execute), and (c) padded-slot
efficiency (also below).  These tests pin (b) and (c).
"""

import numpy as np
import pytest

from dynaalign_tpu.parallel import (
    bucketed_schedule_stats,
    nw_allpairs_schedule_stats,
    plan_nw_allpairs,
)


@pytest.mark.parametrize("n,tile,ndev", [
    (1000, 16, 8),
    (1000, 16, 4),
    (257, 16, 8),
    (8103, 16, 8),
    (100, 8, 2),
])
def test_uniform_schedule_exactly_balanced(n, tile, ndev):
    s = nw_allpairs_schedule_stats(n, tile, ndev)
    assert s["tile_spread"] == 0
    assert s["balance"] == 1.0
    # dummy/padding waste stays small at production scales
    if n >= 1000:
        assert s["pad_efficiency"] >= 0.9


def test_uniform_schedule_covers_triangle():
    tiles, order, inv_order, group, seg = plan_nw_allpairs(100, 16, 8)
    nb = -(-100 // 16)
    want = {(bi, bj) for bi in range(nb) for bj in range(bi, nb)}
    assert want <= set(tiles)
    # reorder/inverse round-trips
    arr = np.arange(len(tiles))
    np.testing.assert_array_equal(arr[order][inv_order], arr)
    assert len(tiles) % (seg) == 0
    assert seg % (8 * group) == 0


def _mixed_panel(n_short=300, n_long=100, seed=0):
    rng = np.random.default_rng(seed)
    aas = list("ARNDCQEGHILKMFPSTWYV")
    seqs = ["".join(rng.choice(aas, size=12)) for _ in range(n_short)]
    seqs += [
        "".join(rng.choice(aas, size=int(rng.integers(500, 580))))
        for _ in range(n_long)
    ]
    return seqs


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_bucketed_schedule_exactly_balanced(ndev):
    s = bucketed_schedule_stats(_mixed_panel(), ndev=ndev)
    assert s["area_spread"] == 0.0
    assert s["balance"] == 1.0
    # padding grows with the ndev*group quantum on this small (400-seq)
    # panel: 0.876 / 0.835 / 0.824 at 2/4/8 devices — still above the
    # BASELINE >=80% bar even before per-chip-rate terms
    assert s["pad_efficiency"] >= 0.8
