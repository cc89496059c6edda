"""Oracle tests for the reference-index layer (SA/ISA/LCP/PLCP/PSV/NSV/BWT)."""
import numpy as np
import pytest

from cmsbwt_tpu.io.fasta import augment_reference
from cmsbwt_tpu.index.host import build_reference_index

from helpers import random_dna


def naive_sa(x: np.ndarray) -> np.ndarray:
    b = bytes(x)
    return np.asarray(sorted(range(len(b)), key=lambda i: b[i:]),
                      dtype=np.int32)


def naive_lcp_pair(x: np.ndarray, a: int, b: int) -> int:
    n = len(x)
    l = 0
    while a + l < n and b + l < n and x[a + l] == x[b + l]:
        l += 1
    return l


@pytest.mark.parametrize("seed,n", [(0, 50), (1, 200), (2, 1000)])
def test_sa_isa_lcp(seed, n):
    rng = np.random.default_rng(seed)
    x = augment_reference(random_dna(rng, n))
    idx = build_reference_index(x)
    sa_ref = naive_sa(x)
    np.testing.assert_array_equal(idx.sa, sa_ref)
    np.testing.assert_array_equal(idx.sa[idx.isa], np.arange(len(x)))
    # LCP
    for i in range(1, len(x)):
        assert idx.lcp[i] == naive_lcp_pair(x, int(idx.sa[i - 1]),
                                            int(idx.sa[i])), i
    assert idx.lcp[0] == 0
    assert idx.lcp[len(x)] == -1
    # PLCP skip bound (ref :272-274)
    for i in range(len(x)):
        expect = max(int(idx.lcp[idx.isa[i]]), int(idx.lcp[idx.isa[i] + 1]))
        assert idx.plcp[i] == expect
    # reference BWT (ref :294-297)
    for i in range(len(x)):
        expect = x[idx.sa[i] - 1] if idx.sa[i] > 0 else 0
        assert idx.bwt[i] == expect


def test_psv_nsv_vs_scan():
    rng = np.random.default_rng(7)
    x = augment_reference(random_dna(rng, 300))
    idx = build_reference_index(x)
    n = idx.n
    lcp = idx.lcp
    for trial in range(200):
        i = int(rng.integers(0, n))
        ub = int(rng.integers(0, 12))
        # psv: scan starts at i itself (rmq_tree.h:184-189)
        exp = -1
        for j in range(i, -1, -1):
            if lcp[j] < ub:
                exp = j
                break
        assert idx.psv(i, ub) == exp
        exp = -1
        for j in range(i, n):
            if lcp[j] < ub:
                exp = j
                break
        assert idx.nsv(i, ub) == exp


def test_augmentation_rules():
    ref = b"ACGT"
    x = augment_reference(ref)
    # all of [3,128) present exactly once beyond the original occurrence
    present = np.bincount(x, minlength=256)
    for c in range(3, 128):
        assert present[c] >= 1
    # sentinels
    assert x[-2] == 1 and x[-1] == 0
    assert present[0] == 1 and present[1] == 1 and present[2] == 0
    # appended extras exclude chars already present
    assert present[ord("A")] == 1
