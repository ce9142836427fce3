// qea_native: host-side native ops for the qea_ocr_tpu framework.
//
// The reference offloads its host string work to dependency-level native
// code (python-Levenshtein C extension, tesserocr C++). This library is the
// framework's own native runtime piece: OpenMP-parallel batch edit distance
// and CTC greedy collapse over int-encoded labels, exposed through a plain
// C ABI for ctypes (no pybind11 in the image).
//
// Build: make -C native   (produces libqea_native.so)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// Levenshtein distance between two int sequences.
static int32_t lev_one(const int32_t* a, int32_t la, const int32_t* b,
                       int32_t lb) {
  if (la == 0) return lb;
  if (lb == 0) return la;
  // Keep the shorter sequence on the inner axis for cache friendliness.
  if (lb > la) {
    std::swap(a, b);
    std::swap(la, lb);
  }
  std::vector<int32_t> row(lb + 1);
  for (int32_t j = 0; j <= lb; ++j) row[j] = j;
  for (int32_t i = 1; i <= la; ++i) {
    int32_t prev_diag = row[0];
    row[0] = i;
    const int32_t ai = a[i - 1];
    for (int32_t j = 1; j <= lb; ++j) {
      const int32_t tmp = row[j];
      const int32_t cost = (ai == b[j - 1]) ? 0 : 1;
      row[j] = std::min({row[j] + 1, row[j - 1] + 1, prev_diag + cost});
      prev_diag = tmp;
    }
  }
  return row[lb];
}

// Batch edit distance: a (B, L1), b (B, L2) int32 with per-row lengths.
void qea_batch_levenshtein(const int32_t* a, const int32_t* a_len,
                           const int32_t* b, const int32_t* b_len, int32_t B,
                           int32_t L1, int32_t L2, int32_t* out) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int32_t i = 0; i < B; ++i) {
    out[i] = lev_one(a + (int64_t)i * L1, a_len[i], b + (int64_t)i * L2,
                     b_len[i]);
  }
}

// Pairwise edit distances within a window of history labels per sample:
// labels (B, W, L), lengths (B, W) -> out (B, W, W).
void qea_pairwise_levenshtein(const int32_t* labels, const int32_t* lengths,
                              int32_t B, int32_t W, int32_t L, int32_t* out) {
#pragma omp parallel for schedule(dynamic, 4)
  for (int32_t b = 0; b < B; ++b) {
    const int32_t* lb = labels + (int64_t)b * W * L;
    const int32_t* ln = lengths + (int64_t)b * W;
    int32_t* ob = out + (int64_t)b * W * W;
    for (int32_t i = 0; i < W; ++i) {
      ob[i * W + i] = 0;
      for (int32_t j = i + 1; j < W; ++j) {
        const int32_t d =
            lev_one(lb + (int64_t)i * L, ln[i], lb + (int64_t)j * L, ln[j]);
        ob[i * W + j] = d;
        ob[j * W + i] = d;
      }
    }
  }
}

// CTC greedy collapse: argmax ids (B, T) -> collapsed (B, T) padded with
// pad_id, and lengths (B,). Drops `blank` and repeated symbols.
void qea_ctc_collapse(const int32_t* ids, int32_t B, int32_t T, int32_t blank,
                      int32_t pad, int32_t* out, int32_t* out_len) {
#pragma omp parallel for schedule(static)
  for (int32_t b = 0; b < B; ++b) {
    const int32_t* row = ids + (int64_t)b * T;
    int32_t* orow = out + (int64_t)b * T;
    int32_t n = 0;
    int32_t prev = blank;
    for (int32_t t = 0; t < T; ++t) {
      const int32_t v = row[t];
      if (v != blank && v != prev) orow[n++] = v;
      prev = v;
    }
    out_len[b] = n;
    for (int32_t t = n; t < T; ++t) orow[t] = pad;
  }
}

// Exact-match + summed CER (distance / max(1, gt_len)) over a batch.
void qea_compare_labels(const int32_t* pred, const int32_t* pred_len,
                        const int32_t* gt, const int32_t* gt_len, int32_t B,
                        int32_t Lp, int32_t Lg, int32_t* correct,
                        double* total_cer) {
  int32_t crt = 0;
  double cer = 0.0;
#pragma omp parallel for schedule(dynamic, 16) reduction(+ : crt, cer)
  for (int32_t i = 0; i < B; ++i) {
    const int32_t* p = pred + (int64_t)i * Lp;
    const int32_t* g = gt + (int64_t)i * Lg;
    const int32_t lp = pred_len[i];
    const int32_t lg = gt_len[i];
    bool eq = (lp == lg);
    if (eq) {
      for (int32_t k = 0; k < lp; ++k) {
        if (p[k] != g[k]) {
          eq = false;
          break;
        }
      }
    }
    if (eq) crt += 1;
    const int32_t d = lev_one(p, lp, g, lg);
    cer += (double)d / (double)(lg > 1 ? lg : 1);
  }
  *correct = crt;
  *total_cer = cer;
}

// Greedy facility-location over a 1-D feature (the dataset pruner's
// diverse-subset selection; reference `pruning/methods.py:10-22` runs
// apricot's numba-compiled optimizer — this is the framework's own native
// equivalent). sim(i, j) = dmax - |x_i - x_j|; each round picks the point
// maximizing sum_j max(sim(i, j), best[j]) (first index wins ties, matching
// numpy argmax). O(k * n^2) time, O(n) memory, OpenMP over candidates.
void qea_facility_location(const double* x, int32_t n, int32_t k,
                           int32_t* out) {
  if (n <= 0 || k <= 0) return;
  double lo = x[0], hi = x[0];
  for (int32_t i = 1; i < n; ++i) {
    lo = std::min(lo, x[i]);
    hi = std::max(hi, x[i]);
  }
  const double dmax = hi - lo;
  std::vector<double> best(n, 0.0);
  std::vector<double> gains(n);
  std::vector<char> taken(n, 0);
  for (int32_t r = 0; r < k && r < n; ++r) {
#pragma omp parallel for schedule(static)
    for (int32_t i = 0; i < n; ++i) {
      if (taken[i]) {
        gains[i] = -1.0;  // real gains are always >= 0
        continue;
      }
      double g = 0.0;
      const double xi = x[i];
      for (int32_t j = 0; j < n; ++j) {
        const double s = dmax - std::abs(xi - x[j]);
        const double d = s - best[j];
        if (d > 0) g += d;
      }
      gains[i] = g;
    }
    int32_t pick = 0;
    for (int32_t i = 1; i < n; ++i) {
      if (gains[i] > gains[pick]) pick = i;
    }
    taken[pick] = 1;
    out[r] = pick;
    const double xp = x[pick];
    for (int32_t j = 0; j < n; ++j) {
      best[j] = std::max(best[j], dmax - std::abs(xp - x[j]));
    }
  }
}

int32_t qea_version(void) { return 2; }

}  // extern "C"
