"""Seeded joint suffix sort (ops/joint_sa.py) vs the generic doubling sort:
the two must produce identical SA/ISA on every joint string, including
separator-dense and pad-boundary configurations."""
import numpy as np
import pytest

import jax.numpy as jnp

from cmsbwt_tpu.index.device import suffix_array_device
from cmsbwt_tpu.io.fasta import augment_reference
from cmsbwt_tpu.ops import ms_dense as MD
from cmsbwt_tpu.utils.jaxcache import bucket_size

from helpers import mutate, random_dna


def _joint(ref_len, docs, seed, doc_len=None, snp=0.05, sep_base=0,
           bucketed=True, trunc=None):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, ref_len)
    ds = [np.frombuffer(mutate(rng, ref, snp), np.uint8)[:doc_len]
          for _ in range(docs)]
    sep = np.full(1, 2, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([d, sep]) for d in ds])
    if trunc:
        sx = sx[:trunc]
    x_aug = augment_reference(ref)
    n, sn = len(x_aug), len(sx)
    n_pad = bucket_size(n) if bucketed else n
    sn_pad = bucket_size(sn) if bucketed else sn
    if sn_pad == sn and (sn == 0 or sx[-1] != 2):
        sn_pad = bucket_size(sn + 1) if bucketed else sn + 1
    # scale covers the GLOBAL separator count (sep_base + this block's own),
    # exactly as the blocked callers pass it
    s_total = int((sx == 2).sum()) + sep_base
    x_u8 = np.zeros(n_pad, np.uint8)
    x_u8[:n] = x_aug
    sx_u8 = np.zeros(sn_pad, np.uint8)
    sx_u8[:sn] = sx
    b, sp = MD._build_joint_device(
        jnp.asarray(x_u8), jnp.asarray(sx_u8), jnp.int32(n), jnp.int32(sn),
        jnp.int32(sep_base), n_pad, sn_pad)
    # order-equivalent integer symbols (byte-major, then instance) for the
    # generic-sort oracle and brute lcp comparisons
    m = n_pad + sn_pad
    j = jnp.asarray(np.asarray(b).astype(np.int64) * (m + 1)
                    + np.asarray(sp), dtype=jnp.int32)
    return j, b, sp


@pytest.mark.parametrize("ref_len,docs,seed,kw", [
    (300, 4, 0, {}),
    (300, 4, 1, {"sep_base": 7}),          # blocked-mode global numbering
    (64, 40, 2, {"doc_len": 5}),           # separator-dense
    (200, 3, 3, {"snp": 0.0}),             # identical copies (deep ties)
    (500, 2, 4, {"trunc": 700}),           # truncated (ends mid-document)
    (128, 1, 5, {"doc_len": 1}),
])
def test_seeded_equals_generic(ref_len, docs, seed, kw):
    j, b, sp = _joint(ref_len, docs, seed, **kw)
    m = int(j.shape[0])
    sa_new, isa_new, hist, pack8, ks_new, split_lv = MD._joint_sa(b, sp, m)
    sa_old, isa_old, _, _ = suffix_array_device(j, m)
    np.testing.assert_array_equal(np.asarray(sa_new), np.asarray(sa_old))
    np.testing.assert_array_equal(np.asarray(isa_new), np.asarray(isa_old))


def _brute_adjacent_lcp(jn, sa, r):
    x, y = jn[sa[r]:], jn[sa[r - 1]:]
    k = 0
    while k < len(x) and k < len(y) and x[k] == y[k]:
        k += 1
    return k


@pytest.mark.parametrize("seed,snp", [(0, 0.02), (1, 0.0), (2, 0.1)])
def test_split_levels_bound_adjacent_lcp(seed, snp):
    """split_lv[r] = L implies lcp(sa[r-1], sa[r]) in [2^(L-1), 2^L)
    (L == SEED_LEVEL only bounds it to < the seed window)."""
    from cmsbwt_tpu.ops.joint_sa import SEED_LEVEL
    j, b, sp = _joint(200, 3, 50 + seed, snp=snp)
    m = int(j.shape[0])
    sa, isa, hist, pack8, k_star, split_lv = MD._joint_sa(b, sp, m)
    jn, san, lvn = np.asarray(j), np.asarray(sa), np.asarray(split_lv)
    rng = np.random.default_rng(seed)
    for r in rng.integers(1, m, size=80):
        ell = _brute_adjacent_lcp(jn, san, r)
        L = lvn[r]
        assert L >= SEED_LEVEL
        assert ell < (1 << L), (r, ell, L)
        if L > SEED_LEVEL:
            assert ell >= (1 << (L - 1)), (r, ell, L)


@pytest.mark.parametrize("seed", range(4))
def test_lift_pairs_matches_brute_lcp(seed):
    """The per-pair-level lift reproduces the exact adjacent LCP."""
    j, b, sp = _joint(150, 3, 100 + seed, snp=0.02)
    m = int(j.shape[0])
    sa, isa, hist, pack8, k_star, split_lv = MD._joint_sa(b, sp, m)
    jn, san = np.asarray(j), np.asarray(sa)
    rng = np.random.default_rng(seed)
    rs = rng.integers(1, m, size=64)
    ai = san[rs].astype(np.int32)
    bi = san[rs - 1].astype(np.int32)
    lv = np.asarray(split_lv)[rs].astype(np.int32)
    from cmsbwt_tpu.ops.joint_sa import lift_pairs
    h = np.asarray(lift_pairs(hist, pack8, jnp.asarray(ai),
                              jnp.asarray(bi), jnp.asarray(lv), m))
    for r, a, bb_, got in zip(rs, ai, bi, h):
        k = _brute_adjacent_lcp(jn, san, r)
        assert got == k, (r, a, bb_, got, k)


@pytest.mark.parametrize("seed,snp", [(0, 0.02), (1, 0.0)])
def test_orchestrated_lift_equals_single_dispatch(seed, snp):
    """The host-orchestrated per-level lift (compacted prefixes) returns
    the same ell as the in-jit single-dispatch variant."""
    j, b, sp = _joint(400, 4, 200 + seed, snp=snp)
    m = int(j.shape[0])
    sa, isa, hist, pack8, k_star, split_lv = MD._joint_sa(b, sp, m)
    stats_dev, ai_all, bi_all, lv_all = MD._irreducible_slots(
        b, sp, sa, isa, split_lv, jnp.int32(m), jnp.int32(0), m, m)
    stats = np.asarray(stats_dev)
    rho_pad = min(MD._pow2_pad(int(stats[0])), m)
    ell_1 = np.asarray(MD._lift_and_fill(
        hist, pack8, ai_all, bi_all, lv_all, isa, m, rho_pad))
    ell_o = np.asarray(MD._lift_orchestrated(
        hist, pack8, ai_all, bi_all, lv_all, isa, stats, m, rho_pad))
    np.testing.assert_array_equal(ell_o, ell_1)


@pytest.mark.parametrize("ref_len,docs,seed,kw", [
    (300, 4, 10, {}),
    (300, 4, 11, {"sep_base": 7}),
    (64, 40, 12, {"doc_len": 5}),
    (200, 3, 13, {"snp": 0.0}),            # identical copies (deep ties)
    (500, 2, 14, {"trunc": 700}),
])
def test_wide_seed_equals_narrow(ref_len, docs, seed, kw):
    """The 32-symbol 4-bit coarse seed must reproduce the byte seed's
    SA/ISA exactly (its precondition holds for ACGT inputs: augmentation
    bytes/sentinels are unique, separators carry instance ranks)."""
    j, b, sp = _joint(ref_len, docs, seed, **kw)
    m = int(j.shape[0])
    sa_w, isa_w, hist_w, packs_w, ks_w, lv_w = MD._joint_sa(
        b, sp, m, wide=True)
    sa_n, isa_n, *_ = MD._joint_sa(b, sp, m)
    np.testing.assert_array_equal(np.asarray(sa_w), np.asarray(sa_n))
    np.testing.assert_array_equal(np.asarray(isa_w), np.asarray(isa_n))
    assert packs_w.shape[0] == 2


@pytest.mark.parametrize("seed,snp", [(0, 0.02), (1, 0.0)])
def test_wide_split_levels_bound_adjacent_lcp(seed, snp):
    from cmsbwt_tpu.ops.joint_sa import WIDE_SEED_LEVEL
    j, b, sp = _joint(200, 3, 70 + seed, snp=snp)
    m = int(j.shape[0])
    sa, isa, hist, packs, k_star, split_lv = MD._joint_sa(
        b, sp, m, wide=True)
    jn, san, lvn = np.asarray(j), np.asarray(sa), np.asarray(split_lv)
    rng = np.random.default_rng(seed)
    for r in rng.integers(1, m, size=80):
        ell = _brute_adjacent_lcp(jn, san, r)
        L = lvn[r]
        assert L >= WIDE_SEED_LEVEL
        assert ell < (1 << L), (r, ell, L)


def test_wide_lift_pairs_exact():
    """lift_pairs with wide packs must return exact lcps (the nib16 tail
    resolves sub-32 windows)."""
    from cmsbwt_tpu.ops.joint_sa import lift_pairs
    j, b, sp = _joint(300, 3, 99, snp=0.03)
    m = int(j.shape[0])
    sa, isa, hist, packs, k_star, split_lv = MD._joint_sa(
        b, sp, m, wide=True)
    jn, san = np.asarray(j), np.asarray(sa)
    rng = np.random.default_rng(0)
    rs = rng.integers(1, m, size=64).astype(np.int32)
    ai = jnp.asarray(san[rs])
    bi = jnp.asarray(san[rs - 1])
    lv = jnp.asarray(np.asarray(split_lv)[rs])
    got = np.asarray(lift_pairs(hist, packs, ai, bi, lv, m))
    for t, r in enumerate(rs):
        assert got[t] == _brute_adjacent_lcp(jn, san, int(r)), (t, r)
