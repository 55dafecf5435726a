// dynaalign_tpu CPU oracle.
//
// A from-scratch C++ implementation of the two similarity kernels whose
// semantics the TPU framework must reproduce:
//
//  * MinHash Jaccard-estimate similarity: MurmurHash3-32 over k-mer string
//    bytes, per-hash min-reduction, signature-agreement fraction.
//    (Behavioural spec: reference src/minHash.cpp:21-188.  Unlike the
//    reference, the hash-seed family here is explicitly seeded so results
//    are reproducible; the reference seeds from std::random_device.)
//
//  * Needleman–Wunsch / Gotoh affine-gap global alignment returning percent
//    identity along the traceback path.  Semantic contract (behavioural spec:
//    reference src/pairwiseSeqAlign.cpp:209-313):
//      - int32 DP with sentinel INT_MIN/2 for unreachable states;
//      - border gaps cost gapOpen + (len-1)*gapExt, interior gap openings
//        cost gapOpen + gapExt for their first residue (asymmetry preserved);
//      - M is overwritten with max(M, Ix, Iy) per cell ("one-matrix"
//        traceback variant of Gotoh);
//      - traceback char priority D (M>=Ix && M>=Iy) > U (Ix>=Iy) > L;
//      - similarity = matches / alignment_length along the traceback.
//
// This file is the *oracle* (bit-exactness target for the JAX/Pallas
// kernels) and the CPU performance baseline ("Rcpp-equivalent" speed) for
// BASELINE.json's >=10x pairs/sec goal.  Exposed as a plain C ABI for
// ctypes (no pybind11 in this image).

#include <algorithm>
#include <climits>
#include <cstdint>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "blosum_tables.h"

namespace dyna {

// ---------------------------------------------------------------------------
// MurmurHash3 x86 32-bit (public domain algorithm, Austin Appleby).
// Little-endian 4-byte block interpretation, matching the reference's
// reinterpret_cast on x86 (src/minHash.cpp:32).
// ---------------------------------------------------------------------------
static inline uint32_t rotl32(uint32_t x, int r) {
  return (x << r) | (x >> (32 - r));
}

uint32_t murmur3_32(const uint8_t* key, size_t len, uint32_t seed) {
  const uint32_t c1 = 0xcc9e2d51u;
  const uint32_t c2 = 0x1b873593u;
  uint32_t h = seed;
  const size_t nblocks = len / 4;
  for (size_t i = 0; i < nblocks; ++i) {
    uint32_t k;
    std::memcpy(&k, key + 4 * i, 4);  // little-endian load
    k *= c1;
    k = rotl32(k, 15);
    k *= c2;
    h ^= k;
    h = rotl32(h, 13) * 5u + 0xe6546b64u;
  }
  const uint8_t* tail = key + nblocks * 4;
  uint32_t k1 = 0;
  switch (len & 3) {
    case 3: k1 ^= static_cast<uint32_t>(tail[2]) << 16; [[fallthrough]];
    case 2: k1 ^= static_cast<uint32_t>(tail[1]) << 8;  [[fallthrough]];
    case 1:
      k1 ^= tail[0];
      k1 *= c1;
      k1 = rotl32(k1, 15);
      k1 *= c2;
      h ^= k1;
  }
  h ^= static_cast<uint32_t>(len);
  h ^= h >> 16;
  h *= 0x85ebca6bu;
  h ^= h >> 13;
  h *= 0xc2b2ae35u;
  h ^= h >> 16;
  return h;
}

// Seeded hash family: n_hash murmur seeds drawn from mt19937.  With a
// full-range uniform_int_distribution<uint32_t> libstdc++ forwards raw
// generator words, so we draw them directly (same values, no
// implementation-defined detour).
void hash_family(int n_hash, uint32_t seed, uint32_t* out) {
  std::mt19937 gen(seed);
  for (int i = 0; i < n_hash; ++i) out[i] = gen();
}

// ---------------------------------------------------------------------------
// MinHash signatures + signature-agreement similarity.
// Sequences are passed as one flat byte buffer with [n+1] offsets.
// ---------------------------------------------------------------------------
void minhash_signatures(const uint8_t* data, const int64_t* offsets,
                        int64_t n, int k, int n_hash, uint32_t seed,
                        uint32_t* out /* [n * n_hash] */) {
  std::vector<uint32_t> seeds(n_hash);
  hash_family(n_hash, seed, seeds.data());
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < n; ++i) {
    uint32_t* sig = out + i * n_hash;
    for (int h = 0; h < n_hash; ++h) sig[h] = UINT32_MAX;
    const uint8_t* seq = data + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    if (k <= 0 || len < k) continue;  // too-short => all-UINT32_MAX signature
    for (int64_t p = 0; p + k <= len; ++p) {
      for (int h = 0; h < n_hash; ++h) {
        uint32_t v = murmur3_32(seq + p, static_cast<size_t>(k), seeds[h]);
        if (v < sig[h]) sig[h] = v;
      }
    }
  }
}

void minhash_similarity_from_sigs(const uint32_t* sigs, int64_t n, int n_hash,
                                  double* out /* [n * n] */) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
  for (int64_t i = 0; i < n; ++i) {
    out[i * n + i] = 1.0;
    for (int64_t j = i + 1; j < n; ++j) {
      const uint32_t* a = sigs + i * n_hash;
      const uint32_t* b = sigs + j * n_hash;
      int matches = 0;
      for (int h = 0; h < n_hash; ++h) matches += (a[h] == b[h]);
      double s = static_cast<double>(matches) / n_hash;
      out[i * n + j] = s;
      out[j * n + i] = s;
    }
  }
}

// ---------------------------------------------------------------------------
// Needleman–Wunsch / Gotoh percent-identity.
// ---------------------------------------------------------------------------
static const int (*lookup_matrix(const char* name))[24] {
  std::string s(name);
  if (s == "BLOSUM62") return BLOSUM62;
  if (s == "BLOSUM50") return BLOSUM50;
  if (s == "BLOSUM45") return BLOSUM45;
  if (s == "BLOSUM80") return BLOSUM80;
  if (s == "BLOSUM90") return BLOSUM90;
  if (s == "BLOSUM100") return BLOSUM100;
  return nullptr;
}

static inline int aa_index(uint8_t c) {
  // Alphabet ARNDCQEGHILKMFPSTWYVBZX* in reference index order.
  switch (c) {
    case 'A': return 0;  case 'R': return 1;  case 'N': return 2;
    case 'D': return 3;  case 'C': return 4;  case 'Q': return 5;
    case 'E': return 6;  case 'G': return 7;  case 'H': return 8;
    case 'I': return 9;  case 'L': return 10; case 'K': return 11;
    case 'M': return 12; case 'F': return 13; case 'P': return 14;
    case 'S': return 15; case 'T': return 16; case 'W': return 17;
    case 'Y': return 18; case 'V': return 19; case 'B': return 20;
    case 'Z': return 21; case 'X': return 22; case '*': return 23;
    default:  return -1;
  }
}

// Single-pair Gotoh DP with traceback.  Flat row buffers + a full traceback
// byte matrix (the oracle favours clarity over memory; the TPU kernel
// instead carries (matches, length) forward — this is what it's checked
// against).  Returns 0 on success, -1 on invalid character.
int nw_pair(const uint8_t* s1, int m, const uint8_t* s2, int n,
            const int (*sub)[24], int gapOpen, int gapExt, double* out) {
  constexpr int NEG = INT_MIN / 2;
  std::vector<int> idx1(m), idx2(n);
  for (int i = 0; i < m; ++i) {
    idx1[i] = aa_index(s1[i]);
    if (idx1[i] < 0) return -1;
  }
  for (int j = 0; j < n; ++j) {
    idx2[j] = aa_index(s2[j]);
    if (idx2[j] < 0) return -1;
  }

  const int w = n + 1;
  std::vector<int> Mrow(w), Ixrow(w), Iyrow(w);      // current row
  std::vector<int> Mprev(w), Ixprev(w), Iyprev(w);   // previous row
  std::vector<uint8_t> tb(static_cast<size_t>(m + 1) * w);

  // Row 0 borders: M[0][0]=0, Iy[0][j] = -gapOpen-(j-1)*gapExt, tb 'L'.
  Mprev[0] = 0;
  Ixprev[0] = Iyprev[0] = NEG;
  tb[0] = '0';
  for (int j = 1; j <= n; ++j) {
    Mprev[j] = NEG;
    Ixprev[j] = NEG;
    Iyprev[j] = -gapOpen - (j - 1) * gapExt;
    tb[j] = 'L';
  }

  for (int i = 1; i <= m; ++i) {
    // Column 0 border: Ix[i][0] = -gapOpen-(i-1)*gapExt, tb 'U'.
    Mrow[0] = NEG;
    Ixrow[0] = -gapOpen - (i - 1) * gapExt;
    Iyrow[0] = NEG;
    tb[static_cast<size_t>(i) * w] = 'U';
    const int* subrow = sub[idx1[i - 1]];
    for (int j = 1; j <= n; ++j) {
      const int score = subrow[idx2[j - 1]];
      const int ix = std::max(Mprev[j] - (gapOpen + gapExt),
                              Ixprev[j] - gapExt);
      const int iy = std::max(Mrow[j - 1] - (gapOpen + gapExt),
                              Iyrow[j - 1] - gapExt);
      const int diag =
          std::max(Mprev[j - 1], std::max(Ixprev[j - 1], Iyprev[j - 1])) +
          score;
      int mcell;
      uint8_t t;
      if (diag >= ix && diag >= iy) {
        mcell = diag;
        t = 'D';
      } else if (ix >= iy) {
        mcell = ix;
        t = 'U';
      } else {
        mcell = iy;
        t = 'L';
      }
      Mrow[j] = mcell;
      Ixrow[j] = ix;
      Iyrow[j] = iy;
      tb[static_cast<size_t>(i) * w + j] = t;
    }
    Mrow.swap(Mprev);
    Ixrow.swap(Ixprev);
    Iyrow.swap(Iyprev);
  }

  // Greedy traceback from (m, n): percent identity along the path.
  int matches = 0, alen = 0;
  int i = m, j = n;
  while (i > 0 || j > 0) {
    uint8_t t = tb[static_cast<size_t>(i) * w + j];
    if (t == 'D') {
      if (s1[i - 1] == s2[j - 1]) ++matches;
      --i;
      --j;
    } else if (t == 'U') {
      --i;
    } else {
      --j;
    }
    ++alen;
  }
  *out = static_cast<double>(matches) / alen;
  return 0;
}

}  // namespace dyna

// ---------------------------------------------------------------------------
// C ABI for ctypes
// ---------------------------------------------------------------------------
extern "C" {

uint32_t dyna_murmur3_32(const uint8_t* key, int64_t len, uint32_t seed) {
  return dyna::murmur3_32(key, static_cast<size_t>(len), seed);
}

void dyna_hash_family(int n_hash, uint32_t seed, uint32_t* out) {
  dyna::hash_family(n_hash, seed, out);
}

void dyna_minhash_signatures(const uint8_t* data, const int64_t* offsets,
                             int64_t n, int k, int n_hash, uint32_t seed,
                             uint32_t* out) {
  dyna::minhash_signatures(data, offsets, n, k, n_hash, seed, out);
}

void dyna_minhash_similarity_from_sigs(const uint32_t* sigs, int64_t n,
                                       int n_hash, double* out) {
  dyna::minhash_similarity_from_sigs(sigs, n, n_hash, out);
}

// Full MinHash similarity pipeline (signatures + agreement matrix).
void dyna_minhash_similarity(const uint8_t* data, const int64_t* offsets,
                             int64_t n, int k, int n_hash, uint32_t seed,
                             double* out) {
  std::vector<uint32_t> sigs(static_cast<size_t>(n) * n_hash);
  dyna::minhash_signatures(data, offsets, n, k, n_hash, seed, sigs.data());
  dyna::minhash_similarity_from_sigs(sigs.data(), n, n_hash, out);
}

int dyna_nw_pair(const uint8_t* s1, int m, const uint8_t* s2, int n,
                 const char* matrix_name, int gap_open, int gap_ext,
                 double* out) {
  const int(*sub)[24] = dyna::lookup_matrix(matrix_name);
  if (!sub) return -2;
  return dyna::nw_pair(s1, m, s2, n, sub, gap_open, gap_ext, out);
}

// All-pairs NW similarity matrix (upper triangle incl. diagonal, mirrored —
// reference driver semantics, src/pairwiseSeqAlign.cpp:331-365).
// n_threads <= 1 gives the serial reference-equivalent baseline.
// Returns 0 on success, -1 invalid char, -2 bad matrix name.
int dyna_nw_allpairs(const uint8_t* data, const int64_t* offsets, int64_t n,
                     const char* matrix_name, int gap_open, int gap_ext,
                     int n_threads, double* out) {
  const int(*sub)[24] = dyna::lookup_matrix(matrix_name);
  if (!sub) return -2;
  int err = 0;
#ifdef _OPENMP
  if (n_threads > 0) omp_set_num_threads(n_threads);
#pragma omp parallel for schedule(dynamic) if (n_threads != 1)
#endif
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* s1 = data + offsets[i];
    const int m = static_cast<int>(offsets[i + 1] - offsets[i]);
    for (int64_t j = i; j < n; ++j) {
      const uint8_t* s2 = data + offsets[j];
      const int len2 = static_cast<int>(offsets[j + 1] - offsets[j]);
      double sim = 0.0;
      int rc = dyna::nw_pair(s1, m, s2, len2, sub, gap_open, gap_ext, &sim);
      if (rc != 0) {
#ifdef _OPENMP
#pragma omp atomic write
#endif
        err = rc;
        sim = 0.0;
      }
      out[i * n + j] = sim;
      out[j * n + i] = sim;
    }
  }
  return err;
}

}  // extern "C"
