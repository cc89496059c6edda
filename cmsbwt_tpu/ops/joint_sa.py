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

Doubling then starts at window 8. LCP lifting needs window-equality tests
at every level; levels >= 3 use the stored dense-rank history, and the
remaining sub-8 bits come from ONE byte-compare of the seed window packs
(``byte8_lcp``) — two gathers replace the six of the former fingerprint
levels. Each round also records, per SA position, the level at which its
left boundary first appeared (``split_lv``): rank-group ranges are
position-stable under refinement, so the final adjacent lcp lies in
[2^(L-1), 2^L) and the lift can start each pair at its own level.
Replaces the ``libsais()`` call of the reference
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

    Returns (sa, isa, hist, pack8, k_star, split_lv):

    * ``hist[r]`` is the dense rank of windows of 2^(r+3);
    * ``pack8`` (int64[m], TEXT order) is the seed's masked 8-byte window
      pack — the sub-8 LCP oracle consumed by the byte-compare tail of the
      lifts (replaces the old f1 fingerprint levels);
    * ``k_star`` is the first level with fully distinct ranks (max
      pairwise lcp < 2^k_star);
    * ``split_lv`` (int32[m], SA order) records, per SA position r >= 1,
      the level at which the boundary between sa[r-1] and sa[r] first
      appeared. Rank groups occupy POSITION-STABLE ranges under
      refinement (refining only reorders within groups), so a boundary's
      position never moves once created, and
      ``lcp(sa[r-1], sa[r]) in [2^(L-1), 2^L)`` for L = split_lv[r] > 3
      (L == 3 only bounds the lcp to < 8). This is what lets the lift
      start each pair at its own top level instead of at k_star.
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
        pack8 = jax.lax.bitcast_convert_type(p8, jnp.int64)
        key = jax.lax.bitcast_convert_type(
            p8 ^ jnp.uint64(1 << 63), jnp.int64)  # order-preserving u64->i64
        k_s, v_s, ord_s = jax.lax.sort((key, v, idx), num_keys=2)
        changed = jnp.concatenate(
            [jnp.ones(1, jnp.int32),
             ((k_s[1:] != k_s[:-1]) | (v_s[1:] != v_s[:-1])
              ).astype(jnp.int32)])
    split_lv = jnp.where(changed == 1, jnp.int32(SEED_LEVEL), 0)
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
        rank, sa, hist, done, k_star, lv = carry
        w = jnp.int32(1) << k

        def do_sort(args):
            rank, sa, lv = args
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
                ch_mid_b = jnp.concatenate(
                    [jnp.ones(1, bool), kk1_s[1:] != kk1_s[:-1]])
                ch_full_b = ch_mid_b | jnp.concatenate(
                    [jnp.ones(1, bool), kk2_s[1:] != kk2_s[:-1]])
            # record first-appearance levels of the new boundaries (group
            # ranges are position-stable, so sorted coords == final coords)
            lv = jnp.where(ch_mid_b & (lv == 0), k + 1, lv)
            lv = jnp.where(ch_full_b & (lv == 0), k + 2, lv)
            mid_sorted = jnp.cumsum(ch_mid_b.astype(jnp.int32)) - 1
            full_sorted = jnp.cumsum(ch_full_b.astype(jnp.int32)) - 1
            _, mid_rank, full_rank = jax.lax.sort(
                (o_s, mid_sorted, full_sorted), num_keys=1)
            return mid_rank, full_rank, o_s, lv

        def skip(args):
            rank, sa, lv = args
            return rank, rank, sa, lv

        mid_rank, full_rank, sa, lv = jax.lax.cond(done, skip, do_sort,
                                                   (rank, sa, lv))
        hist = hist.at[k - SEED_LEVEL + 1].set(mid_rank)
        hist = hist.at[k - SEED_LEVEL + 2].set(full_rank)
        mid_done = jnp.max(mid_rank) == m - 1
        full_done = jnp.max(full_rank) == m - 1
        k_star = jnp.where(done, k_star,
                           jnp.where(mid_done, k + 1,
                                     jnp.where(full_done, k + 2, k_star)))
        done = done | full_done
        return (full_rank, sa, hist, done, k_star, lv), None

    done0 = jnp.max(rank) == m - 1
    sa0 = jnp.zeros(m, jnp.int32)
    k_star0 = jnp.where(done0, SEED_LEVEL, levels).astype(jnp.int32)
    (rank, sa, hist, done, k_star, split_lv), _ = jax.lax.scan(
        round_k, (rank, sa0, hist, done0, k_star0, split_lv),
        jnp.asarray(ks, dtype=jnp.int32))

    def invert(_):
        _, s = jax.lax.sort((rank, idx), num_keys=1)
        return s

    sa = jax.lax.cond(done0, invert, lambda a: a, sa)
    return sa, rank, hist, pack8, k_star, split_lv


def byte8_lcp(pa, pb):
    """Common SYMBOL-prefix length (< 8) of two masked 8-byte window packs
    (int64, first char in the high byte). Two symbols match iff their
    bytes are equal AND neither is a special (bytes 2/255): distinct
    suffixes never share a special instance, so a special always ends the
    match. Pure VPU byte unpacking — no table gathers."""
    with jax.enable_x64(True):
        out = jnp.zeros(pa.shape, jnp.int32)
        eq_so_far = jnp.ones(pa.shape, bool)
        for t in range(8):
            sh = 56 - 8 * t
            ba = (pa >> sh) & jnp.int64(0xFF)
            bb = (pb >> sh) & jnp.int64(0xFF)
            sp = (ba == 2) | (ba == 255) | (bb == 2) | (bb == 255)
            eq_so_far = eq_so_far & (ba == bb) & ~sp
            out = out + eq_so_far.astype(jnp.int32)
    return out


def lift_pairs(hist, pack8, ai, bi, lv, m: int):
    """lcp(ai, bi) for SA-adjacent index pairs by binary lifting.

    ``lv`` is each pair's boundary split level (see joint_suffix_array):
    the lift starts at h = 2^(lv-1) — guaranteed matched — and descends
    the rank history to level 3; the final sub-8 bits come from one
    byte-compare of the seed window packs at the resolved offset. Tests at
    levels above a pair's own range are exact (they simply fail), so the
    shared loop bound is max(lv) - 2. Invalid entries carry ai >= m."""
    valid = (ai < m) & (bi < m)
    lmax = jnp.max(jnp.where(valid, lv, 0))
    h = jnp.where(valid & (lv > SEED_LEVEL),
                  jnp.int32(1) << jnp.maximum(lv - 1, 0), 0)

    def gath(arr, at):
        return arr[jnp.clip(at, 0, m - 1)]

    def body(i, h):
        k = lmax - 2 - i
        rk = jax.lax.dynamic_index_in_dim(
            hist, jnp.maximum(k - SEED_LEVEL, 0), 0, keepdims=False)
        va = ai + h
        vb = bi + h
        ok = valid & (va < m) & (vb < m)
        eq = ok & (gath(rk, va) == gath(rk, vb))
        return h + jnp.where(eq, jnp.int32(1) << k, 0)

    h = jax.lax.fori_loop(
        0, jnp.maximum(lmax - 2 - SEED_LEVEL + 1, 0), body, h)
    rem = byte8_lcp(gath(pack8, ai + h), gath(pack8, bi + h))
    return h + jnp.where(valid, rem, 0)
