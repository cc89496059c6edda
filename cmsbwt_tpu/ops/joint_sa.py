"""Seeded prefix-doubling suffix sort for the joint (reference ++ collection)
string — the hot kernel of the dense MS backend.

The generic doubling pipeline (index/device.py) seeds at window 1 and pays
two ``lax.sort`` passes per doubling round. The joint string built by
ops/ms_dense has byte structure we can exploit (ref chars < 128, separators
all byte 2, pads a dedicated byte), so the first THREE rounds collapse into
ONE two-key sort:

* key 1: the next 8 bytes packed into a uint64, with every byte after the
  window's FIRST special (separator/pad) masked to 0. Specials are pairwise
  distinct symbols in the true joint alphabet, so the true comparison is
  decided no later than the first special — masking keeps the byte order
  from consulting later positions before the instance rank does;
* key 2: the instance rank of that first special (0 if none in the window).
  Two windows that tie on both keys either are byte-identical with no
  special (a true window-8 tie, refined by later rounds) or share the same
  first-special instance — i.e. they are the same window.

The caller must guarantee the joint string ENDS with a special (ms_dense
bumps the pad bucket otherwise): then any window reaching past the end
contains a special first, and past-end bytes never influence a key.

Doubling then starts at window 8. LCP lifting needs window-equality tests at
every level; levels >= 3 use the stored dense-rank history as before, and
levels 2/1/0 use O(1)-space fingerprints instead of rank rows:

* level 0: the joint symbol itself;
* level 1: ``f1 = (j << 31) | (j[i+1] + 1)`` (both fit: symbols < 2^31);
* level 2: two f1 equalities at offsets 0 and +2.

This removes 6 of the ~2·(k*-1)+4 sort passes per joint SA build and 3 rank
rows of HBM. Replaces the ``libsais()`` call of the reference
(ref CMS-BWT-functions.cpp:246-247) on the dense path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..index.device import n_levels

SEED_LEVEL = 3  # the seed sort resolves windows of 2^3 = 8 bytes


@functools.partial(jax.jit, static_argnames=("m",))
def joint_suffix_array(j: jnp.ndarray, b: jnp.ndarray, sp: jnp.ndarray,
                       m: int):
    """Suffix sort of the joint string.

    j  int32[m]  true joint symbols (order-defining; all distinct specials)
    b  uint8[m]  byte image: real char value, separators 2, pads 255
    sp int32[m]  instance rank (>= 1) for specials, 0 for real chars;
                 monotone with j within each special kind

    Returns (sa, isa, hist, f1, k_star): ``hist[r]`` is the dense rank of
    windows of 2^(r+3); ``f1`` the level-1 fingerprint; ``k_star`` the first
    level with fully distinct ranks (max pairwise lcp < 2^k_star).
    """
    levels = n_levels(m)
    idx = jnp.arange(m, dtype=jnp.int32)

    with jax.enable_x64(True):
        # --- first special (separator/pad) at-or-after each position ---
        sp64 = sp.astype(jnp.int64)
        BIGV = jnp.int64(1) << 62
        packed = jnp.where(sp64 > 0,
                           (idx.astype(jnp.int64) << 32) | sp64, BIGV)
        nxt = jax.lax.cummin(packed, axis=0, reverse=True)
        d = jnp.where(nxt < BIGV, (nxt >> 32) - idx.astype(jnp.int64),
                      jnp.int64(8))  # distance to first special (clamped)
        v = jnp.where(d < 8, nxt & jnp.int64(0xFFFFFFFF), 0).astype(jnp.int32)
        # --- seed key 1: 8 packed bytes, MASKED after the first special ---
        # The true symbol comparison is decided no later than the first
        # special (instances are pairwise distinct), so bytes past it are
        # irrelevant — and must be zeroed, or the byte order would consult
        # them before the instance rank (key 2).
        bb = jnp.concatenate([b.astype(jnp.uint64),
                              jnp.zeros(8, jnp.uint64)])
        p8 = jnp.zeros(m, jnp.uint64)
        for k in range(8):
            bk = jax.lax.dynamic_slice(bb, (k,), (m,))
            bk = jnp.where(jnp.int64(k) <= d, bk, jnp.uint64(0))
            p8 = (p8 << jnp.uint64(8)) | bk
        key = jax.lax.bitcast_convert_type(
            p8 ^ jnp.uint64(1 << 63), jnp.int64)  # order-preserving u64->i64
        k_s, v_s, ord_s = jax.lax.sort((key, v, idx), num_keys=2)
        changed = jnp.concatenate(
            [jnp.ones(1, jnp.int32),
             ((k_s[1:] != k_s[:-1]) | (v_s[1:] != v_s[:-1])
              ).astype(jnp.int32)])
        # level-1 fingerprint: pair of symbols; j < 2^31, past-end -> 0
        jn = jnp.concatenate([j[1:], jnp.full(1, -1, jnp.int32)])
        f1 = (j.astype(jnp.int64) << 31) | (jn.astype(jnp.int64) + 1)
    seed_sorted = jnp.cumsum(changed).astype(jnp.int32) - 1
    _, rank = jax.lax.sort((ord_s, seed_sorted), num_keys=1)

    # quadrupling rounds: each sort refines by TWO doubling levels at once
    # — keys (rank, rank@+w) and (rank@+2w, rank@+3w) packed into two int64
    # sort keys. A 2-key sort costs ~1.25x a 1-key sort (measured) but
    # replaces two full rounds (2 sorts each), so the doubling phase runs in
    # about half the passes. Both refined rank rows (window 2w and 4w) are
    # recovered from the ONE sorted order, so the LCP lift still has every
    # level's rank history.
    ks = list(range(SEED_LEVEL, levels - 1, 2))
    n_hist = max((ks[-1] - SEED_LEVEL + 2) + 1 if ks else 1, 1)
    hist = jnp.zeros((n_hist, m), jnp.int32).at[0].set(rank)

    def shifted(r, shift):
        # clamp: a shift >= m must yield all -1 (the padding region)
        shift = jnp.minimum(shift, jnp.int32(m))
        padded = jnp.concatenate([r, jnp.full(m, -1, jnp.int32)])
        return jax.lax.dynamic_slice(padded, (shift,), (m,))

    def round_k(carry, k):
        rank, sa, hist, done, k_star = carry
        w = jnp.int32(1) << k

        def do_sort(args):
            rank, sa = args
            r1 = shifted(rank, w)
            r2 = shifted(rank, 2 * w)
            r3 = shifted(rank, 3 * w)
            with jax.enable_x64(True):
                kk1 = (rank.astype(jnp.int64) << 32) | \
                    (r1.astype(jnp.int64) + 1)
                kk2 = ((r2.astype(jnp.int64) + 1) << 32) | \
                    (r3.astype(jnp.int64) + 1)
                kk1_s, kk2_s, o_s = jax.lax.sort((kk1, kk2, idx),
                                                 num_keys=2)
                ch_mid = jnp.concatenate(
                    [jnp.ones(1, jnp.int32),
                     (kk1_s[1:] != kk1_s[:-1]).astype(jnp.int32)])
                ch_full = jnp.concatenate(
                    [jnp.ones(1, jnp.int32),
                     ((kk1_s[1:] != kk1_s[:-1]) |
                      (kk2_s[1:] != kk2_s[:-1])).astype(jnp.int32)])
            mid_sorted = jnp.cumsum(ch_mid).astype(jnp.int32) - 1
            full_sorted = jnp.cumsum(ch_full).astype(jnp.int32) - 1
            _, mid_rank, full_rank = jax.lax.sort(
                (o_s, mid_sorted, full_sorted), num_keys=1)
            return mid_rank, full_rank, o_s

        def skip(args):
            rank, sa = args
            return rank, rank, sa

        mid_rank, full_rank, sa = jax.lax.cond(done, skip, do_sort,
                                               (rank, sa))
        hist = hist.at[k - SEED_LEVEL + 1].set(mid_rank)
        hist = hist.at[k - SEED_LEVEL + 2].set(full_rank)
        mid_done = jnp.max(mid_rank) == m - 1
        full_done = jnp.max(full_rank) == m - 1
        k_star = jnp.where(done, k_star,
                           jnp.where(mid_done, k + 1,
                                     jnp.where(full_done, k + 2, k_star)))
        done = done | full_done
        return (full_rank, sa, hist, done, k_star), None

    done0 = jnp.max(rank) == m - 1
    sa0 = jnp.zeros(m, jnp.int32)
    k_star0 = jnp.where(done0, SEED_LEVEL, levels).astype(jnp.int32)
    (rank, sa, hist, done, k_star), _ = jax.lax.scan(
        round_k, (rank, sa0, hist, done0, k_star0),
        jnp.asarray(ks, dtype=jnp.int32))

    def invert(_):
        _, s = jax.lax.sort((rank, idx), num_keys=1)
        return s

    sa = jax.lax.cond(done0, invert, lambda a: a, sa)
    return sa, rank, hist, f1, k_star


def lift_pairs(hist, f1, j, ai, bi, k_star, m: int):
    """lcp(ai, bi) for index pairs, by binary lifting: levels >= 3 through
    the rank history, levels 2/1/0 through fingerprints. Caller guarantees
    ai/bi < m for valid entries (invalid entries carry ai >= m)."""
    valid = ai < m
    h = jnp.zeros(ai.shape, jnp.int32)

    def gath(arr, at):
        return arr[jnp.clip(at, 0, m - 1)]

    def body(i, h):
        k = k_star - 1 - i
        rk = hist[jnp.maximum(k - SEED_LEVEL, 0)]
        va = ai + h
        vb = bi + h
        ok = valid & (va < m) & (vb < m)
        eq = ok & (gath(rk, va) == gath(rk, vb))
        return h + jnp.where(eq, jnp.int32(1) << k, 0)

    h = jax.lax.fori_loop(0, jnp.maximum(k_star - SEED_LEVEL, 0), body, h)

    # level 2: windows of 4 == two f1 tests at +0 and +2. The +2 in-bounds
    # guard cannot drop a true match: a window-4 match ending past the end
    # would need equal tail specials, which are pairwise distinct.
    va = ai + h
    vb = bi + h
    ok = valid & (va + 2 < m) & (vb + 2 < m)
    eq = ok & (gath(f1, va) == gath(f1, vb)) & \
        (gath(f1, va + 2) == gath(f1, vb + 2))
    h = h + jnp.where(eq, 4, 0)
    # level 1: f1 (handles the one-past-end truncation via the +1 encoding)
    va = ai + h
    vb = bi + h
    ok = valid & (va < m) & (vb < m)
    eq = ok & (gath(f1, va) == gath(f1, vb))
    h = h + jnp.where(eq, 2, 0)
    # level 0: the symbol itself
    va = ai + h
    vb = bi + h
    ok = valid & (va < m) & (vb < m)
    eq = ok & (gath(j, va) == gath(j, vb))
    h = h + jnp.where(eq, 1, 0)
    return h
