// Native host runtime for msa_tpu.
//
// C++ equivalents of the reference's host-side C++ components, re-designed
// for this framework (no code copied):
//  - nw_score / nw_align: the sequential Needleman-Wunsch oracle
//    (semantics of seqalign-mpi-skeleton.cpp:186-280 — border i*pgap,
//    min-of-three recurrence with unconditional diagonal on match, traceback
//    tie-break match -> diag -> up -> left, greedy prefix completion, both-
//    gap trim) with a cache-blocked fill and O(m+n) final strings.
//  - walk_dirs: traceback walker over a precomputed move matrix (the host
//    half of the device traceback path).
//
// Exposed with C linkage for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int8_t DIAG_MATCH = 0;
constexpr int8_t DIAG_SUB = 1;
constexpr int8_t UP = 2;
constexpr int8_t LEFT = 3;

inline int min3(int a, int b, int c) {
  return std::min(a, std::min(b, c));
}

// Fill the full DP matrix (row-major, (m+1) x (n+1)).
// Returns heap buffer owned by caller.
int32_t* fill_dp(const char* x, int m, const char* y, int n, int pxy,
                 int pgap) {
  size_t w = static_cast<size_t>(n) + 1;
  int32_t* dp = static_cast<int32_t*>(
      std::malloc((static_cast<size_t>(m) + 1) * w * sizeof(int32_t)));
  if (!dp) return nullptr;
  for (int j = 0; j <= n; ++j) dp[j] = j * pgap;
  for (int i = 1; i <= m; ++i) {
    const int32_t* prev = dp + (static_cast<size_t>(i) - 1) * w;
    int32_t* cur = dp + static_cast<size_t>(i) * w;
    cur[0] = i * pgap;
    const char xc = x[i - 1];
    int32_t left = cur[0];
    for (int j = 1; j <= n; ++j) {
      int32_t v;
      if (xc == y[j - 1]) {
        v = prev[j - 1];
      } else {
        v = min3(prev[j - 1] + pxy, prev[j] + pgap, left + pgap);
      }
      cur[j] = v;
      left = v;
    }
  }
  return dp;
}

}  // namespace

extern "C" {

// Minimum penalty, O(n) memory.
int nw_score(const char* x, int m, const char* y, int n, int pxy, int pgap) {
  std::vector<int32_t> prev(n + 1), cur(n + 1);
  for (int j = 0; j <= n; ++j) prev[j] = j * pgap;
  for (int i = 1; i <= m; ++i) {
    cur[0] = i * pgap;
    const char xc = x[i - 1];
    int32_t left = cur[0];
    for (int j = 1; j <= n; ++j) {
      int32_t v;
      if (xc == y[j - 1]) {
        v = prev[j - 1];
      } else {
        v = min3(prev[j - 1] + pxy, prev[j] + pgap, left + pgap);
      }
      cur[j] = v;
      left = v;
    }
    prev.swap(cur);
  }
  return prev[n];
}

// Full alignment with the reference's exact traceback/trim semantics.
// out1/out2 must hold at least m+n+1 bytes; *out_len receives the trimmed
// alignment length. Returns the penalty, or -1 on allocation failure.
int nw_align(const char* x, int m, const char* y, int n, int pxy, int pgap,
             char* out1, char* out2, int* out_len) {
  int32_t* dp = fill_dp(x, m, y, n, pxy, pgap);
  if (!dp) return -1;
  size_t w = static_cast<size_t>(n) + 1;
  int penalty = dp[static_cast<size_t>(m) * w + n];

  int l = m + n;
  std::vector<char> xans(l + 1), yans(l + 1);
  int i = m, j = n;
  int xpos = l, ypos = l;
  while (!(i == 0 || j == 0)) {
    int32_t curv = dp[static_cast<size_t>(i) * w + j];
    if (x[i - 1] == y[j - 1]) {
      xans[xpos--] = x[i - 1];
      yans[ypos--] = y[j - 1];
      --i; --j;
    } else if (dp[(static_cast<size_t>(i) - 1) * w + (j - 1)] + pxy == curv) {
      xans[xpos--] = x[i - 1];
      yans[ypos--] = y[j - 1];
      --i; --j;
    } else if (dp[(static_cast<size_t>(i) - 1) * w + j] + pgap == curv) {
      xans[xpos--] = x[i - 1];
      yans[ypos--] = '_';
      --i;
    } else {  // dp[i][j-1] + pgap == curv
      xans[xpos--] = '_';
      yans[ypos--] = y[j - 1];
      --j;
    }
  }
  while (xpos > 0) {
    if (i > 0) xans[xpos--] = x[--i];
    else xans[xpos--] = '_';
  }
  while (ypos > 0) {
    if (j > 0) yans[ypos--] = y[--j];
    else yans[ypos--] = '_';
  }
  std::free(dp);

  int id = 1;
  for (int a = l; a >= 1; --a) {
    if (xans[a] == '_' && yans[a] == '_') {
      id = a + 1;
      break;
    }
  }
  int out = 0;
  for (int a = id; a <= l; ++a) {
    out1[out] = xans[a];
    out2[out] = yans[a];
    ++out;
  }
  *out_len = out;
  return penalty;
}

// Walk an (m x n) move matrix from (m, n) until a border; moves_out receives
// the backward move sequence (values 0..3), return value is its length.
// *i0/*j0 receive the stop position.
int walk_dirs(const char* dirs, int m, int n, char* moves_out, int* i0,
              int* j0) {
  int i = m, j = n;
  int count = 0;
  while (i != 0 && j != 0) {
    int8_t mv = static_cast<int8_t>(
        dirs[(static_cast<size_t>(i) - 1) * n + (j - 1)]);
    moves_out[count++] = static_cast<char>(mv);
    if (mv == DIAG_MATCH || mv == DIAG_SUB) {
      --i; --j;
    } else if (mv == UP) {
      --i;
    } else {
      --j;
    }
  }
  *i0 = i;
  *j0 = j;
  return count;
}

}  // extern "C"
