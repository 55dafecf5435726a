// One greedy Louvain phase-1 pass over a CSR graph — an exact
// IEEE-double transcription of the numpy loop in
// dynaalign_tpu/cluster/louvain.py::_one_level (which itself mirrors
// igraph cluster_louvain's greedy node moves, the reference's
// clustering engine, /root/reference/R/clusterbreak.R:126).
//
// Bit-compatibility contract (tests/test_cluster.py asserts numpy ==
// native membership):
//  * neighbor-community weights accumulate in NEIGHBOR order into
//    slots assigned by SORTED community id — exactly np.unique +
//    np.bincount(inv, weights);
//  * gains are computed per slot as w_to - (gamma*kv * sum_tot[c]) /
//    two_m with the same association order as the numpy expression;
//  * argmax is first-maximum over ascending community order
//    (np.argmax), move condition `gain > stay + 1e-12`;
//  * the node visit order comes from the caller (numpy's
//    rng.permutation), one call per pass, so the RNG stream advances
//    identically to the pure-numpy path.
//
// Compiled with -std=c++17 (strict ISO: no FP contraction), matching
// cpp/msa_dp.cpp's bit-exactness approach.

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" int64_t dyna_louvain_pass(
    const int64_t* indptr,   // [n+1]
    const int64_t* indices,  // [nnz]
    const double* data,      // [nnz]
    int64_t n,
    const double* strengths,  // [n]
    double two_m,
    double gamma,
    const int64_t* order,  // [n] visit order (caller's rng.permutation)
    int64_t* comm,         // [n] in/out community assignment
    double* sum_tot        // [n] in/out per-community total strength
) {
    std::vector<uint8_t> mark(static_cast<size_t>(n), 0);
    std::vector<int64_t> slot_of(static_cast<size_t>(n), 0);
    std::vector<int64_t> uniq;
    std::vector<double> w_slot;
    int64_t improved = 0;

    for (int64_t oi = 0; oi < n; ++oi) {
        const int64_t v = order[oi];
        const int64_t cv = comm[v];
        const double kv = strengths[v];
        const int64_t lo = indptr[v], hi = indptr[v + 1];

        uniq.clear();
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t u = indices[i];
            if (u == v) continue;  // self-loops don't count toward gains
            const int64_t c = comm[u];
            if (!mark[c]) {
                mark[c] = 1;
                uniq.push_back(c);
            }
        }
        if (uniq.empty()) continue;
        std::sort(uniq.begin(), uniq.end());
        w_slot.assign(uniq.size(), 0.0);
        for (size_t j = 0; j < uniq.size(); ++j) slot_of[uniq[j]] = (int64_t)j;
        // accumulate in neighbor order (np.bincount element order)
        for (int64_t i = lo; i < hi; ++i) {
            const int64_t u = indices[i];
            if (u == v) continue;
            w_slot[slot_of[comm[u]]] += data[i];
        }

        sum_tot[cv] -= kv;
        const double gk = gamma * kv;
        double best_g = 0.0;
        int64_t best_slot = -1;
        double stay_g = 0.0;
        bool cv_in = false;
        for (size_t j = 0; j < uniq.size(); ++j) {
            const double g = w_slot[j] - (gk * sum_tot[uniq[j]]) / two_m;
            if (uniq[j] == cv) {
                stay_g = g;
                cv_in = true;
            }
            if (best_slot < 0 || g > best_g) {  // first max (np.argmax)
                best_g = g;
                best_slot = (int64_t)j;
            }
        }
        double stay = cv_in ? stay_g : -((gk * sum_tot[cv]) / two_m);
        if (stay < 0.0) stay = 0.0;  // empty-community restart scores 0

        if (best_g > stay + 1e-12 && uniq[best_slot] != cv) {
            comm[v] = uniq[best_slot];
            sum_tot[uniq[best_slot]] += kv;
            improved = 1;
        } else {
            sum_tot[cv] += kv;
        }
        for (const int64_t c : uniq) mark[c] = 0;
    }
    return improved;
}
