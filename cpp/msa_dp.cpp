// Native affine-gap profile-DP row sweep for the progressive MSA
// (consensus/msa.py:_row_dp).  PERFORMANCE kernel, not reference
// parity: the reference delegates its MSA to DECIPHER::AlignSeqs
// (R/clusterbreak.R:315); this is the hot inner loop of our
// from-scratch equivalent.  The numpy row formulation dispatches ~15
// small vector ops per DP row (~1.7M dispatches for a 200-sequence
// cluster); this C++ loop computes the same IEEE-double arithmetic in
// one pass.
//
// The operations transcribe consensus/msa.py:_row_dp EXACTLY (same
// candidates, same D > U > L priority, same prefix-running-max
// formulation of the in-row Iy chain, same order of floating-point
// operations), so the returned traceback matrix is bit-identical to
// the numpy path — tests/test_consensus.py asserts equality.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" void dyna_msa_row_dp(
    const double* score_rows,  // [m, n] row-major profile scores
    int64_t m, int64_t n,
    double go, double ge,
    uint8_t* tb  // out: [(m+1), (n+1)] 0=D, 1=U, 2=L
) {
  const double NEGF = -1e18;
  std::vector<double> m_prev(n + 1, NEGF);
  std::vector<double> ix_prev(n + 1, NEGF);
  std::vector<double> iy_prev(n + 1, NEGF);
  std::vector<double> ix(n), mnew(n), iy(n), mrow(n);
  m_prev[0] = 0.0;
  for (int64_t j = 1; j <= n; ++j)
    iy_prev[j] = -go - (double)(j - 1) * ge;

  tb[0] = 0;
  for (int64_t i = 1; i <= m; ++i) tb[i * (n + 1)] = 1;  // 'U'
  for (int64_t j = 1; j <= n; ++j) tb[j] = 2;            // 'L'

  for (int64_t i = 1; i <= m; ++i) {
    const double* sc = score_rows + (i - 1) * n;
    for (int64_t t = 0; t < n; ++t) {
      ix[t] = std::max(m_prev[t + 1] - (go + ge), ix_prev[t + 1] - ge);
      double diag =
          std::max(m_prev[t], std::max(ix_prev[t], iy_prev[t]));
      mnew[t] = diag + sc[t];
    }
    // in-row Iy chain as a prefix running-max of pre[j'] + j'*ge,
    // pre = max(mnew, ix) — same identity as the numpy path
    double run = NEGF;
    uint8_t* trow = tb + i * (n + 1) + 1;
    for (int64_t t = 0; t < n; ++t) {
      if (t >= 1) {
        double cand =
            std::max(mnew[t - 1], ix[t - 1]) + (double)t * ge;
        run = std::max(run, cand);
      }
      iy[t] = run - (go + ge) - (double)t * ge;
      double mv;
      uint8_t tr;
      if (mnew[t] >= ix[t] && mnew[t] >= iy[t]) {
        mv = mnew[t];
        tr = 0;
      } else if (ix[t] >= iy[t]) {
        mv = ix[t];
        tr = 1;
      } else {
        mv = iy[t];
        tr = 2;
      }
      mrow[t] = mv;
      trow[t] = tr;
    }
    const double border = -go - (double)(i - 1) * ge;
    m_prev[0] = NEGF;
    ix_prev[0] = border;
    iy_prev[0] = NEGF;
    for (int64_t t = 0; t < n; ++t) {
      m_prev[t + 1] = mrow[t];
      ix_prev[t + 1] = ix[t];
      iy_prev[t + 1] = iy[t];
    }
  }
}
