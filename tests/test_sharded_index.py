"""Sharded int64 suffix-array prototype (parallel/sharded_index.py): the
scaled-down executable validation of docs/giant_references.md, run on the
virtual 8-device CPU mesh (conftest forces the CPU platform + 8 devices).

The dtype path is the >2^31 one (int64 global indices, two-key int64
sorts); the inputs are small so the mesh logic — halo-exchange shifts,
sample-sort exchanges, cross-shard rank continuation — is what's tested.
"""
import numpy as np
import pytest

import jax

from cmsbwt_tpu.parallel.sharded_index import sharded_suffix_array


def np_suffix_array(x: np.ndarray) -> np.ndarray:
    order = sorted(range(len(x)), key=lambda i: tuple(x[i:]))
    return np.asarray(order, dtype=np.int64)


def _check(x):
    sa, isa = sharded_suffix_array(x)
    ref = np_suffix_array(x)
    np.testing.assert_array_equal(sa, ref)
    np.testing.assert_array_equal(isa[sa], np.arange(len(x)))
    assert sa.dtype == np.int64 and isa.dtype == np.int64


@pytest.mark.parametrize("n", [5, 64, 257, 1024])
def test_sharded_sa_random(n):
    rng = np.random.default_rng(n)
    x = rng.integers(1, 5, n).astype(np.uint8)
    x[-1] = 0  # unique terminator, as the pipeline's augmented refs have
    _check(x)


def test_sharded_sa_repetitive():
    # long tie groups spanning shard boundaries (the cross-shard
    # continuation path): periodic text
    x = np.frombuffer(b"abab" * 100 + b"\x00", dtype=np.uint8).copy()
    _check(x)


def test_sharded_sa_all_equal():
    x = np.frombuffer(b"a" * 333 + b"\x00", dtype=np.uint8).copy()
    _check(x)


def test_sharded_sa_uses_all_devices():
    assert len(jax.devices()) >= 8  # the virtual mesh is in force
    x = np.frombuffer(b"mississippi\x00", dtype=np.uint8).copy()
    _check(x)


def test_sharded_lcp_matches_oracle():
    from cmsbwt_tpu.parallel.sharded_index import \
        sharded_suffix_array_with_lcp
    rng = np.random.default_rng(23)
    for n in (17, 130, 700):
        x = rng.integers(1, 5, n).astype(np.uint8)
        x[-1] = 0
        sa, isa, lcp = sharded_suffix_array_with_lcp(x)
        ref_sa = np_suffix_array(x)
        np.testing.assert_array_equal(sa, ref_sa)
        # oracle LCP
        exp = np.zeros(n + 1, np.int64)
        exp[n] = -1
        for i in range(1, n):
            a, b = x[sa[i - 1]:], x[sa[i]:]
            m = 0
            while m < len(a) and m < len(b) and a[m] == b[m]:
                m += 1
            exp[i] = m
        np.testing.assert_array_equal(lcp, exp)
        assert lcp.dtype == np.int64


def test_sharded_lcp_repetitive():
    from cmsbwt_tpu.parallel.sharded_index import \
        sharded_suffix_array_with_lcp
    x = np.frombuffer(b"abcabc" * 60 + b"\x00", dtype=np.uint8).copy()
    sa, isa, lcp = sharded_suffix_array_with_lcp(x)
    n = len(x)
    exp_sa = np_suffix_array(x)
    np.testing.assert_array_equal(sa, exp_sa)
    for i in range(1, n):
        a, b = x[sa[i - 1]:], x[sa[i]:]
        m = 0
        while m < len(a) and m < len(b) and a[m] == b[m]:
            m += 1
        assert lcp[i] == m, i
