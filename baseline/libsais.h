/* Minimal libsais-compatible API used by the reference tool.
 *
 * This is NOT libsais (the submodule is not vendored); it is an
 * independent correctness-oriented implementation of the same public
 * contract (IlyaGrebnov/libsais API), used only to compile the reference
 * tool for byte-equality cross-checks. See libsais_shim.cpp.
 */
#ifndef LIBSAIS_SHIM_H
#define LIBSAIS_SHIM_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Suffix array of an 8-bit string. Returns 0 on success. */
int32_t libsais(const uint8_t *T, int32_t *SA, int32_t n, int32_t fs,
                int32_t *freq);

/* Suffix array of a 32-bit integer string over alphabet [0, k). */
int32_t libsais_int(int32_t *T, int32_t *SA, int32_t n, int32_t k,
                    int32_t fs);

/* Permuted LCP array: PLCP[i] = lcp(i, Phi[i]) with Phi[SA[j]] = SA[j-1]. */
int32_t libsais_plcp(const uint8_t *T, const int32_t *SA, int32_t *PLCP,
                     int32_t n);

/* LCP in suffix order: LCP[j] = PLCP[SA[j]], LCP[0] = 0. */
int32_t libsais_lcp(const int32_t *PLCP, const int32_t *SA, int32_t *LCP,
                    int32_t n);

#ifdef __cplusplus
}
#endif

#endif
