/* Correctness-oriented implementation of the libsais API subset used by the
 * reference tool (see libsais.h). Prefix-doubling (Manber–Myers) with
 * std::sort — O(n log^2 n), plenty for the cross-check workloads.
 */
#include "libsais.h"

#include <algorithm>
#include <numeric>
#include <vector>

namespace {

/* Manber–Myers doubling with counting-sort passes: O(n log n), linear
 * memory. rank values are always in [0, n); the secondary key rank[i+k]
 * is shifted by +1 so 0 can mean "past the end". */
template <typename V>
static void suffix_sort(const V &vals, int32_t *SA, int32_t n) {
  std::vector<int32_t> rank(n), tmp(n), sa(n), cnt;
  // initial ranks from character values (counting sort over value range)
  {
    int64_t lo = vals[0], hi = vals[0];
    for (int32_t i = 1; i < n; i++) {
      lo = std::min<int64_t>(lo, vals[i]);
      hi = std::max<int64_t>(hi, vals[i]);
    }
    int64_t range = hi - lo + 1;
    cnt.assign(range + 1, 0);
    for (int32_t i = 0; i < n; i++) cnt[vals[i] - lo + 1]++;
    for (int64_t c = 1; c <= range; c++) cnt[c] += cnt[c - 1];
    for (int32_t i = 0; i < n; i++) sa[cnt[vals[i] - lo]++] = i;
    rank[sa[0]] = 0;
    for (int32_t i = 1; i < n; i++)
      rank[sa[i]] = rank[sa[i - 1]] + (vals[sa[i]] != vals[sa[i - 1]]);
  }
  std::vector<int32_t> sa2(n);
  for (int32_t k = 1; rank[sa[n - 1]] != n - 1; k <<= 1) {
    // sort by secondary key rank2 = (i+k < n) ? rank[i+k]+1 : 0 via
    // counting sort, then stable counting sort by primary rank
    cnt.assign(n + 2, 0);
    auto rank2 = [&](int32_t i) {
      return (i + k < n) ? rank[i + k] + 1 : 0;
    };
    for (int32_t i = 0; i < n; i++) cnt[rank2(i) + 1]++;
    for (int32_t c = 1; c <= n + 1; c++) cnt[c] += cnt[c - 1];
    for (int32_t i = 0; i < n; i++) sa2[cnt[rank2(i)]++] = i;
    cnt.assign(n + 1, 0);
    for (int32_t i = 0; i < n; i++) cnt[rank[i] + 1]++;
    for (int32_t c = 1; c <= n; c++) cnt[c] += cnt[c - 1];
    for (int32_t i = 0; i < n; i++) sa[cnt[rank[sa2[i]]]++] = sa2[i];
    tmp[sa[0]] = 0;
    for (int32_t i = 1; i < n; i++) {
      bool neq = rank[sa[i]] != rank[sa[i - 1]] ||
                 rank2(sa[i]) != rank2(sa[i - 1]);
      tmp[sa[i]] = tmp[sa[i - 1]] + neq;
    }
    rank.swap(tmp);
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
