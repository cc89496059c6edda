/* Correctness-oriented implementation of the libsais API subset used by the
 * reference tool (see libsais.h). Prefix-doubling (Manber–Myers) with
 * std::sort — O(n log^2 n), plenty for the cross-check workloads.
 */
#include "libsais.h"

#include <algorithm>
#include <numeric>
#include <vector>

namespace {

template <typename V>
static void suffix_sort(const V &vals, int32_t *SA, int32_t n) {
  std::vector<int64_t> rank(n), tmp(n);
  std::vector<int32_t> sa(n);
  std::iota(sa.begin(), sa.end(), 0);
  for (int32_t i = 0; i < n; i++) rank[i] = vals[i];
  for (int64_t k = 1;; k <<= 1) {
    auto key = [&](int32_t i) {
      int64_t second = (i + k < n) ? rank[i + k] : -1;
      return std::pair<int64_t, int64_t>(rank[i], second);
    };
    std::sort(sa.begin(), sa.end(),
              [&](int32_t a, int32_t b) { return key(a) < key(b); });
    tmp[sa[0]] = 0;
    for (int32_t i = 1; i < n; i++)
      tmp[sa[i]] = tmp[sa[i - 1]] + (key(sa[i - 1]) < key(sa[i]) ? 1 : 0);
    rank.swap(tmp);
    if (rank[sa[n - 1]] == n - 1) break;
  }
  std::copy(sa.begin(), sa.end(), SA);
}

}  // namespace

extern "C" int32_t libsais(const uint8_t *T, int32_t *SA, int32_t n,
                           int32_t fs, int32_t *freq) {
  (void)fs;
  if (n < 0) return -1;
  if (n == 0) return 0;
  if (freq) {
    for (int i = 0; i < 256; i++) freq[i] = 0;
    for (int32_t i = 0; i < n; i++) freq[T[i]]++;
  }
  suffix_sort(T, SA, n);
  return 0;
}

extern "C" int32_t libsais_int(int32_t *T, int32_t *SA, int32_t n, int32_t k,
                               int32_t fs) {
  (void)k;
  (void)fs;
  if (n < 0) return -1;
  if (n == 0) return 0;
  suffix_sort(T, SA, n);
  return 0;
}

extern "C" int32_t libsais_plcp(const uint8_t *T, const int32_t *SA,
                                int32_t *PLCP, int32_t n) {
  if (n < 0) return -1;
  if (n == 0) return 0;
  std::vector<int32_t> phi(n, -1);
  for (int32_t j = 1; j < n; j++) phi[SA[j]] = SA[j - 1];
  int32_t l = 0;
  for (int32_t i = 0; i < n; i++) {
    int32_t p = phi[i];
    if (p < 0) {
      PLCP[i] = 0;
      l = 0;
      continue;
    }
    while (i + l < n && p + l < n && T[i + l] == T[p + l]) l++;
    PLCP[i] = l;
    if (l > 0) l--;
  }
  return 0;
}

extern "C" int32_t libsais_lcp(const int32_t *PLCP, const int32_t *SA,
                               int32_t *LCP, int32_t n) {
  if (n < 0) return -1;
  for (int32_t j = 0; j < n; j++) LCP[j] = PLCP[SA[j]];
  if (n > 0) LCP[0] = 0;
  return 0;
}
