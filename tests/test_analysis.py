"""Analysis layer: stats and plotting."""

import numpy as np
import pytest

from dynaalign_tpu.analysis import (
    compute_similarity_stats,
    consensus_plot,
    plot_similarity_matrix,
)


def sample_matrix():
    return np.array(
        [
            [1.0, 0.8, 0.1],
            [0.8, 1.0, 0.3],
            [0.1, 0.3, 1.0],
        ]
    )


def test_stats_values():
    s = compute_similarity_stats(sample_matrix())
    assert s.mean_similarity == pytest.approx((0.8 + 0.1 + 0.3) / 3)
    assert s.median_similarity == pytest.approx(0.3)
    assert s.min_similarity == 0.1
    assert s.max_similarity == 0.8
    # 1-based, column-major first hit (R's which(..., arr.ind=TRUE)[1,]
    # scans column 1 first, so the mirrored lower-triangle cell wins)
    assert s.most_similar_pair == (2, 1)
    assert s.least_similar_pair == (3, 1)


def test_stats_validation():
    with pytest.raises(ValueError):
        compute_similarity_stats(np.zeros(3))
    with pytest.warns(UserWarning, match="not symmetric"):
        compute_similarity_stats(np.array([[1.0, 0.2], [0.3, 1.0]]))


def test_heatmap_renders(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ax, ro, co = plot_similarity_matrix(sample_matrix(), cluster=True)
    assert sorted(ro.tolist()) == [0, 1, 2]
    ax.figure.savefig(tmp_path / "heat.png")
    plt.close("all")
    ax2, ro2, _ = plot_similarity_matrix(sample_matrix(), cluster=False)
    np.testing.assert_array_equal(ro2, np.arange(3))
    plt.close("all")


def test_consensus_plot_renders(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    df = np.array(
        [
            ["1.1", "AAAAPPPP"],
            ["1.2", "AAAAPPPG"],
            ["2.1", "WWWWYYYY"],
            ["2.2", "WWWWYYYG"],
        ],
        dtype=object,
    )
    ax, member = consensus_plot(df, k_size=2, hash_size=50)
    assert len(member) == 4
    ax.figure.savefig(tmp_path / "net.png")
    plt.close("all")
    # quirk-compat mode must also render
    ax2, member2 = consensus_plot(df, quirk_compat=True)
    assert len(member2) == 4
    plt.close("all")
