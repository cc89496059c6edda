"""RETIRED (round 5, VERDICT r4 item 6). This Mosaic kernel cannot
compile on the target chip: the toolchain caps ``tpu.dynamic_gather``
at a 128-lane extent ("Multiple source vregs along gather dimension"
is Not implemented), so the kernel's VMEM-resident wide-row tables
never lower (docs/pallas_ms_kernel.md). It is preserved here as the
reference for the in-kernel 3-level block-minima PSV/NSV design; the
production equivalents are ops/ms_jump.py (device range-max descent)
and native/cmsbwt_scan.cpp (host 3-level block minima). NOT imported
by the package.

"""
Pallas MS scan kernel: the head-jumping lane state machine of
``ops/ms_jump`` run INSIDE one TPU kernel with the reference index resident
in VMEM (SURVEY.md §7.4 hard part #1; ref hot loops
``CMS-BWT-functions.cpp:45-149,357-403``).

Why a kernel at all: XLA gathers on this chip element-serialize at
~60-100 M elem/s and each dependent gather round pays a ~100 us latency
floor, so the jump backend's per-iteration cost is dominated by ~90
sequential gather rounds (11-16 ms per wave step). Mosaic's
``tpu.dynamic_gather`` along the lane dimension runs in-register instead;
with every index table stored as a single logical row ``(1, T)`` in VMEM
(v5e VMEM is large enough for the whole index at bench scale), a full
wave step runs in O(100 us) — two orders of magnitude over the XLA form.

Layout contract (everything int32, everything a wide row):

* ``x_row (1, n_pad)``     reference chars (one int32 per char)
* ``sa_row / isa_row``     suffix array / inverse
* ``lcp_row (1, n_pad)``   LCP (LCP[n] = -1 sentinel preserved)
* ``g_row (1, n_pad)``     g[p] = p + PLCP[p] (skip descents)
* block structures: per 128-block minima (LCP) / maxima (g) plus a full
  sparse table OVER THE BLOCK ARRAY, flattened level-major into one row —
  PSV/NSV/next-ge queries are two in-block passes + a coarse descent
  (``rmq_tree``'s block tree, ref rmq_tree.h:48-230, recast gather-free)
* ``sx4_row (1, sn/4)``    collection packed 4 chars/word (VMEM budget)

The kernel advances L lanes; per iteration each lane runs one masked
extend step (windowed singleton compare | fused binary-search round pair)
and one masked skip+adjust step — the exact state machine of
``ms_jump_step`` (same emissions, same canonical candidate chain), so the
downstream compaction and device merge are shared unchanged.

This module is importable without a TPU: every query helper is pure jnp
(unit-tested on CPU against index/device.py's sparse tables), and the
kernel itself runs under ``interpret=True`` in the test suite.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

BLOCK = 128  # in-block scan width; block tree arity (rmq_tree bits=7)

DN_AX1 = lax.GatherDimensionNumbers(
    offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
    operand_batching_dims=(0,), start_indices_batching_dims=(0,))


def _iota_row(size: int) -> jnp.ndarray:
    """(1, size) int32 iota (TPU rejects 1D iota; guide §Math)."""
    return lax.broadcasted_iota(jnp.int32, (1, size), 1)


def _row_gather_eq(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return lax.gather(tbl, idx[..., None], DN_AX1, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def row_gather(tbl: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[0, j] = tbl[0, idx[0, j]] — arbitrary flat gather built on the
    one Mosaic-supported form (lane-dim ``tpu.dynamic_gather``, which
    requires index shape == operand shape): narrower index rows are padded
    to the table width, wider ones are chunked. idx must be in-bounds."""
    T = tbl.shape[1]
    Q = idx.shape[1]
    if Q == T:
        return _row_gather_eq(tbl, idx)
    if Q < T:
        pad = jnp.zeros((1, T - Q), jnp.int32)
        full = jnp.concatenate([idx, pad], axis=1)
        return lax.slice(_row_gather_eq(tbl, full), (0, 0), (1, Q))
    outs = []
    for off in range(0, Q, T):
        w = min(T, Q - off)
        chunk = lax.slice(idx, (0, off), (1, off + w))
        outs.append(row_gather(tbl, chunk))
    return jnp.concatenate(outs, axis=1)


def _levels_for(nb: int) -> int:
    from ..index.device import sparse_table_levels
    return sparse_table_levels(nb)


# ---------------------------------------------------------------------------
# Block-tree structures (built in XLA, queried inside the kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "reduce_max"))
def build_block_tree(base: jnp.ndarray, n: int, reduce_max: bool):
    """(block_agg (1, nb), tree_row (1, levels*nb)) where block_agg[b] =
    min/max of base[b*128 .. b*128+127] (padded with +inf/-inf past n) and
    tree_row holds the sparse table over block_agg, level-major."""
    pad_val = (-(2**31 - 1)) if reduce_max else (2**31 - 1)
    nb = -(-n // BLOCK)
    padded = jnp.full(nb * BLOCK, pad_val, jnp.int32).at[:n].set(base[:n])
    blk = padded.reshape(nb, BLOCK)
    agg = (jnp.max(blk, axis=1) if reduce_max else jnp.min(blk, axis=1))
    levels = _levels_for(nb)
    idx = jnp.arange(nb, dtype=jnp.int32)
    tree = jnp.zeros((levels, nb), jnp.int32).at[0].set(agg)

    def level(tree, k):
        half = jnp.int32(1) << (k - 1)
        prev = tree[k - 1]
        other = jnp.where(idx + half < nb,
                          prev[jnp.minimum(idx + half, nb - 1)], pad_val)
        comb = jnp.maximum(prev, other) if reduce_max else \
            jnp.minimum(prev, other)
        return tree.at[k].set(comb), None

    tree, _ = jax.lax.scan(level, tree,
                           jnp.arange(1, levels, dtype=jnp.int32))
    return agg.reshape(1, nb), tree.reshape(1, levels * nb)


# ---------------------------------------------------------------------------
# Query helpers (run inside the kernel; pure jnp over (1, L) rows)
# ---------------------------------------------------------------------------

def _inblock_scan(base_row, blk, i_limit, ub, n: int, want_right: bool,
                  below: bool):
    """Per lane: scan block ``blk`` of ``base_row`` for positions j with
    (j <= i_limit if below else j >= i_limit) and base[j] < ub; return the
    rightmost (want_right) or leftmost such j, else -1.

    One gather of 128 values per lane + a reshaped lane-row reduction.
    """
    L = blk.shape[1]
    karange = _iota_row(BLOCK)
    start = blk * BLOCK                                   # (1, L)
    qi = start.reshape(L, 1) + karange                    # (L, 128)
    vals = row_gather(base_row,
                      jnp.clip(qi.reshape(1, L * BLOCK), 0,
                               base_row.shape[1] - 1))
    vals = vals.reshape(L, BLOCK)
    j = qi
    lim = i_limit.reshape(L, 1)
    side = (j <= lim) if below else (j >= lim)
    ok = side & (vals < ub.reshape(L, 1)) & (j < n) & (j >= 0)
    if want_right:
        best = jnp.max(jnp.where(ok, j, -1), axis=1)
    else:
        big = jnp.int32(2**31 - 1)
        best = jnp.min(jnp.where(ok, j, big), axis=1)
        best = jnp.where(best == big, -1, best)
    return best.reshape(1, L)


def _coarse_desc_left(tree_row, nb: int, levels: int, b_from, ub):
    """Rightmost block b <= b_from with tree value < ub, else -1.
    Standard sparse-table descent walking left from b_from (inclusive)."""
    d = jnp.zeros_like(b_from)
    valid = b_from >= 0
    for k in range(levels - 1, -1, -1):
        w = jnp.int32(1) << k
        s = b_from - d - w + 1
        okr = valid & (s >= 0)
        mins = row_gather(tree_row,
                          jnp.clip(k * nb + jnp.maximum(s, 0),
                                   0, tree_row.shape[1] - 1))
        take = okr & (mins >= ub)
        d = d + jnp.where(take, w, 0)
    res = b_from - d
    return jnp.where(valid & (res >= 0), res, -1)


def _coarse_desc_right(tree_row, nb: int, levels: int, b_from, ub,
                       reduce_max: bool):
    """Leftmost block b >= b_from with tree value < ub (min tree) or
    >= ub (max tree, reduce_max=True), else nb."""
    d = jnp.zeros_like(b_from)
    for k in range(levels - 1, -1, -1):
        w = jnp.int32(1) << k
        s = b_from + d
        okr = s + w <= nb
        agg = row_gather(tree_row,
                         jnp.clip(k * nb + jnp.minimum(s, nb - 1),
                                  0, tree_row.shape[1] - 1))
        miss = (agg < ub) if reduce_max else (agg >= ub)
        take = okr & miss
        d = d + jnp.where(take, w, 0)
    return jnp.minimum(b_from + d, nb)


def psv_row(lcp_row, tree_row, nb: int, levels: int, i, ub, n: int):
    """Largest j <= i with LCP[j] < ub, else -1 — psv_device semantics
    (index/device.py:174-192) on the two-level block tree."""
    i_c = jnp.clip(i, 0, n - 1)
    bi = i_c // BLOCK
    own = _inblock_scan(lcp_row, bi, i_c, ub, n, want_right=True,
                        below=True)
    need = own < 0
    bprev = _coarse_desc_left(tree_row, nb, levels,
                              jnp.maximum(bi - 1, -1), ub)
    bprev_c = jnp.maximum(bprev, 0)
    other = _inblock_scan(lcp_row, bprev_c, jnp.full_like(i, n - 1), ub, n,
                          want_right=True, below=True)
    res = jnp.where(need, jnp.where(bprev < 0, -1, other), own)
    return jnp.where(i < 0, -1, res)


def nsv_row(lcp_row, tree_row, nb: int, levels: int, i, ub, n: int):
    """Smallest j >= i (j < n) with LCP[j] < ub, else -1 — nsv_device
    semantics (index/device.py:195-212)."""
    i_c = jnp.clip(i, 0, n - 1)
    bi = i_c // BLOCK
    own = _inblock_scan(lcp_row, bi, i_c, ub, n, want_right=False,
                        below=False)
    need = own < 0
    bnext = _coarse_desc_right(tree_row, nb, levels,
                               jnp.minimum(bi + 1, nb), ub,
                               reduce_max=False)
    bnext_c = jnp.minimum(bnext, nb - 1)
    other = _inblock_scan(lcp_row, bnext_c, jnp.zeros_like(i), ub, n,
                          want_right=False, below=False)
    res = jnp.where(need, jnp.where(bnext >= nb, -1, other), own)
    return jnp.where(i >= n, -1, res)


def gather2d(tbl2d: jnp.ndarray, idx2d: jnp.ndarray) -> jnp.ndarray:
    """out[i, j] = tbl2d[i, idx2d[i, j]] — per-row lane gather (the 2D form
    of tpu.dynamic_gather; rows up to 128 lanes wide)."""
    return lax.gather(tbl2d, idx2d[..., None], DN_AX1, (1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def next_ge_row(g_row, gtree_row, nb: int, levels: int, start, t_val,
                n: int):
    """Smallest p >= start with g[p] >= t_val (p < n), else n —
    ms_jump.next_ge_device semantics on the two-level max tree."""
    s_c = jnp.clip(start, 0, n - 1)
    bs_ = s_c // BLOCK
    karange = _iota_row(BLOCK)
    L = start.shape[1]
    qi = (bs_ * BLOCK).reshape(L, 1) + karange
    vals = row_gather(g_row, jnp.clip(qi.reshape(1, L * BLOCK), 0,
                                      g_row.shape[1] - 1)).reshape(L, BLOCK)
    ok = (qi >= s_c.reshape(L, 1)) & (qi < n) & \
        (vals >= t_val.reshape(L, 1))
    big = jnp.int32(2**31 - 1)
    own = jnp.min(jnp.where(ok, qi, big), axis=1).reshape(1, L)
    need = own == big
    bnext = _coarse_desc_right(gtree_row, nb, levels,
                               jnp.minimum(bs_ + 1, nb), t_val,
                               reduce_max=True)
    bnext_c = jnp.minimum(bnext, nb - 1)
    qi2 = (bnext_c * BLOCK).reshape(L, 1) + karange
    vals2 = row_gather(g_row, jnp.clip(qi2.reshape(1, L * BLOCK), 0,
                                       g_row.shape[1] - 1)
                       ).reshape(L, BLOCK)
    ok2 = (qi2 < n) & (vals2 >= t_val.reshape(L, 1))
    other = jnp.min(jnp.where(ok2, qi2, big), axis=1).reshape(1, L)
    res = jnp.where(need, jnp.where(bnext >= nb, n, other), own)
    res = jnp.where(start >= n, n, res)
    return jnp.minimum(res, n)


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

from ..config import SEPARATOR


def _unpack_window(words: jnp.ndarray, a: jnp.ndarray, W: int):
    """bytes[l, m] = byte (a[l]+m) of the word stream words[l, :] — the
    per-lane unaligned W-char window from 4-packed words.

    words: (L, W//4 + 1) int32; a: (L, 1) in [0, 4). Replicate each word
    4x along lanes so rep[:, a+m] = words[:, (a+m)//4], then shift by the
    byte phase — four static-alignment variants selected per lane.
    """
    L, nw = words.shape
    rep = jnp.broadcast_to(words[:, :, None], (L, nw, 4)).reshape(L, nw * 4)
    marange = _iota_row(W)
    out = jnp.zeros((L, W), jnp.int32)
    for av in range(4):
        shifts = ((av + marange) & 3) * 8
        chunk = lax.slice(rep, (0, av), (L, av + W))
        b = (chunk >> shifts) & 255
        out = jnp.where(a == av, b, out)
    return out


def make_step_kernel(*, n: int, n_row: int, nb: int, lv_l: int, gnb: int,
                     lv_g: int, sn_cap: int, L: int, W: int,
                     iters: int, rounds: int):
    """Build the kernel body for one Pallas wave step (``iters``
    iterations of the masked extend -> skip+adjust state machine of
    ops/ms_jump.ms_jump_step, with identical emissions)."""
    Wq = W // 4 + 1

    def sx_byte(sx4, t):
        tc = jnp.clip(t, 0, sn_cap - 1)
        w = row_gather(sx4, tc >> 2)
        return (w >> ((tc & 3) * 8)) & 255

    def kernel(x_ref, sa_ref, isa_ref, lcp_ref, g_ref, ltree_ref,
               gtree_ref, sx4_ref, ends_ref, lim_ref,
               t_ref, len_ref, lb_ref, rb_ref, pos_ref, fin_ref, done_ref,
               viol_ref,
               t_o, len_o, lb_o, rb_o, pos_o, fin_o, done_o, viol_o,
               emitA_ref, emitB_ref, emitC_ref):
        # lim_ref (SMEM int32[1,2]): [0,0] = count of canonical chars in
        # this collection slice; [0,1] = 1 when the slice is a mid-
        # collection segment (reads past the limit are garbage and must
        # flag a context violation), 0 when the slice reaches the true
        # collection end (reads past it are the canonical zero pad).
        lim = lim_ref[0, 0]
        chk = lim_ref[0, 1]
        x = x_ref[:]
        sa = sa_ref[:]
        isa = isa_ref[:]
        lcp = lcp_ref[:]
        g = g_ref[:]
        ltree = ltree_ref[:]
        gtree = gtree_ref[:]
        sx4 = sx4_ref[:]
        ends = ends_ref[:]

        def sa_at(m):
            return row_gather(sa, jnp.clip(m, 0, n - 1))

        def x_at(i):
            return row_gather(x, jnp.clip(i, 0, n_row - 1))

        def isa_at(i):
            return row_gather(isa, jnp.clip(i, 0, n - 1))

        def iter_body(k, st):
            t, length, lb, rb, pos, fin, done, viol = st
            karange = _iota_row(W)
            # ---------------- EXTEND (ms_jump_step extend_body) ----------
            act = (done == 0) & (fin == 0)
            cur_char = sx_byte(sx4, t)
            sep_emit = act & (length == 0) & (cur_char == SEPARATOR)

            singleton = act & ~sep_emit & (lb == rb)
            j_abs = t + length
            w0 = jnp.clip(j_abs, 0, sn_cap - 1) >> 2
            widx = w0.reshape(L, 1) + _iota_row(Wq)
            words = row_gather(
                sx4, jnp.clip(widx.reshape(1, L * Wq), 0,
                              sx4.shape[1] - 1)).reshape(L, Wq)
            a = (jnp.clip(j_abs, 0, sn_cap - 1) & 3).reshape(L, 1)
            win_sx = _unpack_window(words, a, W)
            # past-the-end collection chars read as 0 (ms_jump pads sx
            # with zeros); mask explicitly since packing rounds up
            jm = j_abs.reshape(L, 1) + karange
            win_sx = jnp.where(jm < lim, win_sx, 0)
            xq = pos.reshape(L, 1) + length.reshape(L, 1) + karange
            win_x = row_gather(
                x, jnp.clip(xq.reshape(1, L * W), 0, n_row - 1)
            ).reshape(L, W)
            neq = win_sx != win_x
            any_neq = jnp.any(neq, axis=1).reshape(1, L)
            dmm = jnp.min(jnp.where(neq, karange, W),
                          axis=1).astype(jnp.int32).reshape(1, L)
            sgl_final = singleton & any_neq
            dmm_b = jnp.broadcast_to(
                jnp.clip(dmm, 0, W - 1).reshape(L, 1), (L, W))
            x_mis = lax.slice(gather2d(win_x, dmm_b),
                              (0, 0), (L, 1)).reshape(1, L)
            s_mis = lax.slice(gather2d(win_sx, dmm_b),
                              (0, 0), (L, 1)).reshape(1, L)
            sgl_smaller = x_mis > s_mis

            nons = act & ~sep_emit & (lb != rb)
            c = sx_byte(sx4, j_abs)
            c2 = jnp.concatenate([c, c], axis=1)
            len2 = jnp.concatenate([length, length], axis=1)

            def bs_cond(carry):
                lo1, hi1, lo2, hi2, r = carry
                live = nons & ((lo1 < hi1) | (lo2 < hi2))
                return jnp.any(live) & (r < rounds)

            def bs_body(carry):
                lo1, hi1, lo2, hi2, r = carry
                m1 = (lo1 + hi1) >> 1
                m2 = (lo2 + hi2) >> 1
                m12 = jnp.concatenate([m1, m2], axis=1)
                s12 = row_gather(sa, jnp.clip(m12, 0, n - 1))
                k12 = row_gather(x, jnp.clip(s12 + len2, 0, n_row - 1))
                k1 = lax.slice(k12, (0, 0), (1, L))
                k2 = lax.slice(k12, (0, L), (1, 2 * L))
                go1 = k1 < c
                lo1n = jnp.where(go1, m1 + 1, lo1)
                hi1n = jnp.where(go1, hi1, m1)
                a1 = lo1 < hi1
                lo1 = jnp.where(a1, lo1n, lo1)
                hi1 = jnp.where(a1, hi1n, hi1)
                go2 = k2 <= c
                lo2n = jnp.where(go2, m2 + 1, lo2)
                hi2n = jnp.where(go2, hi2, m2)
                a2 = lo2 < hi2
                lo2 = jnp.where(a2, lo2n, lo2)
                hi2 = jnp.where(a2, hi2n, hi2)
                return lo1, hi1, lo2, hi2, r + 1

            lower, _, upper, _, _ = lax.while_loop(
                bs_cond, bs_body, (lb, rb + 1, lb, rb + 1, jnp.int32(0)))
            bs_found = nons & (lower < upper)
            insertion = lower
            at_end = insertion == rb + 1
            bs_maxmatch = jnp.where(at_end, rb, insertion)
            bs_smaller = ~at_end
            bs_final = nons & (lower >= upper)

            new_lb = jnp.where(bs_found, lower, lb)
            new_rb = jnp.where(bs_found, upper - 1, rb)
            new_pos = jnp.where(bs_found, sa_at(lower), pos)
            new_len = length + jnp.where(bs_found, 1, 0) \
                + jnp.where(singleton, dmm, 0)
            final = sgl_final | bs_final
            fpos = jnp.where(bs_final, sa_at(bs_maxmatch), new_pos)
            fsml = jnp.where(bs_final, bs_smaller, sgl_smaller)

            emit_now = final | sep_emit
            e_pos = jnp.where(sep_emit, n - 1, fpos)
            e_len = jnp.where(sep_emit, 0, new_len)
            e_sml = jnp.where(sep_emit, jnp.zeros_like(fsml), fsml)
            emitA_ref[pl.ds(k, 1), :] = \
                e_pos | jnp.where(e_sml, jnp.int32(-2**31), 0)
            emitB_ref[pl.ds(k, 1), :] = e_len
            emitC_ref[pl.ds(k, 1), :] = jnp.where(emit_now, t, -1)

            t = t + jnp.where(emit_now, 1, 0)
            length = jnp.where(sep_emit, 0,
                               jnp.where(final, new_len - 1,
                                         jnp.where(act, new_len, length)))
            lb = jnp.where(sep_emit, 0,
                           jnp.where(act & ~final, new_lb, lb))
            rb = jnp.where(sep_emit, n - 1,
                           jnp.where(act & ~final, new_rb, rb))
            pos = jnp.where(sep_emit, n - 1,
                            jnp.where(final, fpos,
                                      jnp.where(act, new_pos, pos)))
            fin = jnp.where(final, 1, fin)
            done = jnp.where(act & (t >= ends), 1, done)
            # segment-context violation: this extension step could read
            # past the slice's canonical chars — its outcome may differ
            # from the full-collection scan; the driver retries the
            # segment with a wider right context
            touch = act & ~sep_emit & (j_abs + W > lim)
            viol = jnp.where((chk == 1) & touch, 1, viol)

            # -------------- SKIP + ADJUST (skip_adjust_body) --------------
            park = (fin == 1) & (done == 0)
            p_found = next_ge_row(g, gtree, gnb, lv_g,
                                  jnp.clip(pos + 1, 0, n),
                                  pos + length + 1, n)
            q = jnp.clip(p_found - (pos + 1), 0, None)
            q = jnp.where(park, jnp.minimum(q, ends - t), 0)
            t = t + q
            pos = pos + q
            length = length - jnp.where(park, q, 0)
            done = jnp.where(park & (t >= ends), 1, done)
            alive = park & (t < ends)
            adj_sgl = alive & (lb == rb)
            adj_wide = alive & (lb != rb)
            suflo = sa_at(lb)
            sufhi = sa_at(rb)
            at_root = adj_wide & ((suflo == n - 1) | (sufhi == n - 1))
            qlo = jnp.where(adj_sgl, isa_at(pos + 1), isa_at(suflo + 1))
            qhi = jnp.where(adj_sgl, isa_at(pos + 1), isa_at(sufhi + 1))
            p = psv_row(lcp, ltree, nb, lv_l, qlo, length, n)
            p = jnp.where(p == -1, 0, p)
            qn = nsv_row(lcp, ltree, nb, lv_l, qhi + 1, length, n)
            qn = jnp.where(qn == -1, n - 1, qn - 1)
            adj_apply = alive & ~at_root
            lb = jnp.where(adj_apply, p, jnp.where(at_root, 0, lb))
            rb = jnp.where(adj_apply, qn, jnp.where(at_root, n - 1, rb))
            pos = jnp.where(alive, sa_at(lb), pos)
            fin = jnp.where(alive, 0, fin)
            return (t, length, lb, rb, pos, fin, done, viol)

        st = (t_ref[:], len_ref[:], lb_ref[:], rb_ref[:], pos_ref[:],
              fin_ref[:], done_ref[:], viol_ref[:])
        t, length, lb, rb, pos, fin, done, viol = lax.fori_loop(
            0, iters, iter_body, st)
        t_o[:] = t
        len_o[:] = length
        lb_o[:] = lb
        rb_o[:] = rb
        pos_o[:] = pos
        fin_o[:] = fin
        done_o[:] = done
        viol_o[:] = viol

    return kernel


# ---------------------------------------------------------------------------
# Step wrapper + driver
# ---------------------------------------------------------------------------

def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("n", "n_row", "nb", "lv_l", "gnb", "lv_g",
                     "sn_cap", "L", "W", "iters", "rounds", "interpret"),
    donate_argnums=(10, 11, 12, 13, 14, 15, 16, 17))
def ms_pallas_step(x_row, sa_row, isa_row, lcp_row, g_row, ltree_row,
                   gtree_row, sx4_row, ends_row, lim_row,
                   t, ln, lb, rb, pos, fin, done, viol, *,
                   n: int, n_row: int, nb: int, lv_l: int, gnb: int,
                   lv_g: int, sn_cap: int, L: int, W: int,
                   iters: int, rounds: int, interpret: bool = False):
    """One Pallas wave step: ``iters`` kernel-internal iterations; state
    rows are donated and updated in place; emissions come back as three
    (iters, L) buffers (C row: emitting lane's slice-local t, -1
    otherwise). lim_row int32[1,2] = [valid chars in slice, check flag]
    (traced, so segment retries with wider context reuse the compile)."""
    from jax.experimental.pallas import tpu as pltpu
    kernel = make_step_kernel(
        n=n, n_row=n_row, nb=nb, lv_l=lv_l, gnb=gnb, lv_g=lv_g,
        sn_cap=sn_cap, L=L, W=W, iters=iters, rounds=rounds)
    row = jax.ShapeDtypeStruct((1, L), jnp.int32)
    emit = jax.ShapeDtypeStruct((iters, L), jnp.int32)
    vm = pl.BlockSpec(memory_space=pltpu.VMEM)
    sm = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=(row,) * 8 + (emit,) * 3,
        in_specs=[vm] * 9 + [sm] + [vm] * 8,
        out_specs=(vm,) * 11,
        input_output_aliases={10: 0, 11: 1, 12: 2, 13: 3, 14: 4, 15: 5,
                              16: 6, 17: 7},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x_row, sa_row, isa_row, lcp_row, g_row, ltree_row, gtree_row,
      sx4_row, ends_row, lim_row, t, ln, lb, rb, pos, fin, done, viol)


INT_MAX = np.int32(2**31 - 1)


@functools.partial(jax.jit, static_argnames=("keep",))
def _filter_valid(A, B, C, keep: int):
    """Compact valid emission rows (C >= 0) to the front, slice to
    ``keep`` (a bucketed bound on the valid count)."""
    k = jnp.where(C >= 0, 0, 1).astype(jnp.int32)
    _, Af, Bf, Cf = jax.lax.sort((k, A, B, C), num_keys=1)
    sl = lambda a: jax.lax.dynamic_slice(a, (0,), (keep,))
    return sl(Af), sl(Bf), sl(Cf)


@functools.partial(jax.jit, static_argnames=("sn", "h_pad", "sn_cap"))
def _compact_emissions(A, B, C, sx4_row, sn: int, sn_cap: int, h_pad: int):
    """Flat emission buffers -> compacted head arrays (+ head char), the
    global head test of ops/ms_jump._compact_candidates: candidate at t
    with predecessor (pt, ppos) is a head iff pos != ppos + (t - pt)."""
    valid = C >= 0
    key = jnp.where(valid, C, INT_MAX)
    t_f, a_f, b_f = jax.lax.sort((key, A, B), num_keys=1)
    total = jnp.sum(valid.astype(jnp.int32))
    rows = jnp.arange(C.shape[0], dtype=jnp.int32)
    vs = rows < total
    pos_f = a_f & INT_MAX
    sml_f = a_f < 0
    prev_t = jnp.concatenate([jnp.full(1, -1, jnp.int32), t_f[:-1]])
    prev_pos = jnp.concatenate([jnp.full(1, -2, jnp.int32), pos_f[:-1]])
    is_head = vs & (pos_f != prev_pos + (t_f - prev_t))
    is_head = is_head | (vs & (rows == 0))
    sml = sml_f & is_head
    h = jnp.sum(is_head.astype(jnp.int32))
    hkey = jnp.where(is_head, rows, INT_MAX)
    _, t_h, pos_h, len_h, sml_h = jax.lax.sort(
        (hkey, t_f, pos_f, b_f, sml.astype(jnp.int32)), num_keys=1)
    sl = lambda arr: jax.lax.dynamic_slice(arr, (0,), (h_pad,))
    t_h = sl(t_h)
    hvalid = jnp.arange(h_pad, dtype=jnp.int32) < h
    prev_idx = jnp.where(t_h > 0, t_h - 1, sn - 1)
    pc = jnp.clip(prev_idx, 0, sn_cap - 1)
    w = sx4_row[0, pc >> 2]
    chr_h = jnp.where(hvalid,
                      ((w >> ((pc & 3) * 8)) & 255).astype(jnp.uint8),
                      jnp.uint8(0))
    zero = lambda arr: jnp.where(hvalid, sl(arr), 0)
    return (jnp.where(hvalid, t_h, 0), zero(pos_h), zero(len_h),
            zero(sml_h) != 0, chr_h, h)


def pallas_index_fits(n: int,
                      vmem_budget_bytes: int = 100 * 1024 * 1024) -> bool:
    """Whether the reference index fits the kernel's VMEM residency plan.

    NOTE: no live caller — auto-dispatch to pallas was removed after the
    2026-08 hardware probes (Mosaic dynamic_gather <=128-lane extent makes
    the kernel uncompilable on this toolchain). Retained with the
    interpret-validated design for future toolchains; not a dispatch
    predicate.

    The kernel keeps ~8 int32 rows of length ~n in VMEM (text, SA, ISA,
    LCP, g = i + PLCP, two-level block-tree minima/maxima) -> ~32 bytes
    per reference char against a ~100 MB budget (the 128 MB compiler
    limit minus collection segments and scratch)."""
    return n > 0 and 32 * n <= vmem_budget_bytes


def ms_pallas_heads(x_aug: np.ndarray, sx: np.ndarray, lanes: int = 4096,
                    window: int = 64, iters: int = 128,
                    segment_chars: int = 16 << 20,
                    ctx_chars: int = 1 << 18,
                    interpret: bool | None = None, index=None):
    """Pallas-kernel MS scan end-to-end on device; returns a
    DeviceHeadsResult (ops/ms_dense layout) ready for engine/device_merge.

    Semantics identical to ops/ms_jump.ms_jump_heads (same canonical
    candidate chain); the wave loop runs inside the kernel so per-
    iteration cost is VMEM-gather bound instead of XLA-gather bound.
    """
    from ..index.device import build_device_index
    from ..utils.jaxcache import bucket_size, enable_compilation_cache
    from .ms_dense import DeviceHeadsResult, _stage_timer
    from .ms_jump import _ref_pad
    enable_compilation_cache()
    if interpret is None:
        # non-TPU platforms (CPU tests, virtual meshes) run the kernel in
        # the Pallas interpreter — same program, reference semantics
        interpret = not any(d.platform == "tpu" for d in jax.devices())
    mark = _stage_timer()
    sn = int(len(sx))
    if index is None:
        index = build_device_index(np.asarray(x_aug))
    n = index.n

    # --- rows ---
    PADC = 1024
    n_row = _round_up(n + PADC, BLOCK)
    xp = index.x_padded.astype(jnp.int32)
    x_row = jnp.full((1, n_row), 255, jnp.int32)
    x_row = x_row.at[0, :xp.shape[0]].set(xp)
    npad = _round_up(n, BLOCK)
    sa_row = jnp.zeros((1, npad), jnp.int32).at[0, :n].set(index.sa)
    isa_row = jnp.zeros((1, npad), jnp.int32).at[0, :n].set(index.isa)
    lcp_row = jnp.full((1, npad), INT_MAX, jnp.int32)
    lcp_row = lcp_row.at[0, :n].set(index.lcp[:n])
    idxr = jnp.arange(n, dtype=jnp.int32)
    g = idxr + index.plcp[:n]
    g_row = jnp.full((1, npad), -INT_MAX, jnp.int32).at[0, :n].set(g)
    _, ltree = build_block_tree(index.lcp[:n], n, reduce_max=False)
    _, gtree = build_block_tree(g, n, reduce_max=True)
    nb = -(-n // BLOCK)
    lv_l = _levels_for(nb)
    mark("pallas_rows")

    # --- collection: slices of 4-packed words (VMEM cannot hold very
    # long collections; segments are exact by the pure-function argument,
    # with an adaptive right context + in-kernel violation flag for
    # factors that extend past the slice — the pallas form of the blocked
    # dense path's adaptive ctx) ---
    W = window
    from .ms_device import _bs_rounds
    ROUNDS = _bs_rounds(n)

    seg_chars = int(segment_chars)
    seg_chars = max(4 * BLOCK, (seg_chars // (4 * BLOCK)) * (4 * BLOCK))
    emits = []
    base = 0
    steps_total = 0
    sxb = np.asarray(sx, np.uint8)
    while base < sn:
        seg_sn = min(seg_chars, sn - base)
        ctx = min(ctx_chars, max(sn - (base + seg_sn), 0))
        while True:
            tail_all = (base + seg_sn + ctx) >= sn
            avail = min(sn - base, seg_sn + ctx)
            slice_cap = _round_up(
                bucket_size(max(seg_chars, avail) + max(ctx, 1) + W + 4),
                4 * BLOCK)
            sxp = np.zeros(slice_cap, np.uint8)
            sxp[:avail] = sxb[base:base + avail]
            sx4_row = jnp.asarray(
                np.frombuffer(sxp.tobytes(), "<i4").copy()).reshape(1, -1)
            L = max(1, min(lanes, seg_sn))
            chunk_len = -(-seg_sn // L)
            starts = (np.arange(L) * chunk_len).astype(np.int32)
            ends = np.minimum(starts + chunk_len, seg_sn).astype(np.int32)
            ends_row = jnp.asarray(ends).reshape(1, L)
            lim_row = jnp.asarray(
                [[avail, 0 if tail_all else 1]], jnp.int32)
            st = dict(
                t=jnp.asarray(starts).reshape(1, L),
                ln=jnp.zeros((1, L), jnp.int32),
                lb=jnp.zeros((1, L), jnp.int32),
                rb=jnp.full((1, L), n - 1, jnp.int32),
                pos=jnp.full((1, L), n - 1, jnp.int32),
                fin=jnp.zeros((1, L), jnp.int32),
                done=jnp.asarray(starts >= ends).astype(
                    jnp.int32).reshape(1, L),
                viol=jnp.zeros((1, L), jnp.int32))
            statics = dict(n=n, n_row=n_row, nb=nb, lv_l=lv_l, gnb=nb,
                           lv_g=lv_l, sn_cap=int(sx4_row.shape[1] * 4),
                           L=L, W=W, iters=iters, rounds=ROUNDS,
                           interpret=interpret)
            seg_emits = []
            steps = 0
            last_phi = -1
            while True:
                out = ms_pallas_step(
                    x_row, sa_row, isa_row, lcp_row, g_row, ltree, gtree,
                    sx4_row, ends_row, lim_row, st["t"], st["ln"],
                    st["lb"], st["rb"], st["pos"], st["fin"], st["done"],
                    st["viol"], **statics)
                (st["t"], st["ln"], st["lb"], st["rb"], st["pos"],
                 st["fin"], st["done"], st["viol"]) = out[:8]
                seg_emits.append(out[8:])
                steps += 1
                # phi strictly increases while any lane works (t advances
                # on emission/skip, length during extension) — a stalled
                # phi across a whole step means genuinely stuck lanes
                flags = np.asarray(jnp.stack([
                    jnp.any(st["done"] == 0).astype(jnp.int64),
                    jnp.any(st["viol"] == 1).astype(jnp.int64),
                    (2 * jnp.sum(st["t"].astype(jnp.int64))
                     + jnp.sum(st["ln"].astype(jnp.int64)))]))
                if flags[1] or not flags[0]:
                    break
                if int(flags[2]) == last_phi:
                    raise RuntimeError(
                        "ms_pallas: no lane progress in a full step")
                last_phi = int(flags[2])
            steps_total += steps
            if not bool(flags[1]):
                break
            # context violation: some factor may extend past the slice —
            # widen geometrically and redo the segment (rare: needs a
            # factor longer than ctx at a segment boundary)
            ctx = min(max(ctx * 4, 1 << 16), max(sn - (base + seg_sn), 0))
        # compact this segment's emissions (the raw (iters, L) buffers
        # are >90% empty rows; keeping them all until the end would pin
        # O(steps * iters * L) HBM)
        off = jnp.int32(base)
        segA = jnp.concatenate([e[0].reshape(-1) for e in seg_emits])
        segB = jnp.concatenate([e[1].reshape(-1) for e in seg_emits])
        segC = jnp.concatenate([e[2].reshape(-1) for e in seg_emits])
        segC = jnp.where(segC >= 0, segC + off, -1)
        nvalid = int(np.asarray(jnp.sum((segC >= 0).astype(jnp.int32))))
        keep = min(bucket_size(nvalid + 1), int(segC.shape[0]))
        emits.append(_filter_valid(segA, segB, segC, keep))
        base += seg_sn
    mark("pallas_scan(steps=%d)" % steps_total)

    # global sx words for the compaction's head-char gather
    sn_cap = _round_up(sn + 4, 4 * BLOCK)
    sxp = np.zeros(sn_cap, np.uint8)
    sxp[:sn] = sxb
    sx4_all = jnp.asarray(
        np.frombuffer(sxp.tobytes(), "<i4").copy()).reshape(1, -1)

    A = jnp.concatenate([e[0] for e in emits])
    B = jnp.concatenate([e[1] for e in emits])
    C = jnp.concatenate([e[2] for e in emits])
    flat_pad = bucket_size(int(C.shape[0]))
    if flat_pad > C.shape[0]:
        padn = flat_pad - C.shape[0]
        A = jnp.concatenate([A, jnp.zeros(padn, jnp.int32)])
        B = jnp.concatenate([B, jnp.zeros(padn, jnp.int32)])
        C = jnp.concatenate([C, jnp.full(padn, -1, jnp.int32)])
    total = int(np.asarray(jnp.sum((C >= 0).astype(jnp.int32))))
    h_pad = min(bucket_size(total + 1), int(C.shape[0]))
    t_h, pos_h, len_h, sml_h, chr_h, h_dev = _compact_emissions(
        A, B, C, sx4_all, sn, sn_cap, h_pad)
    h = int(np.asarray(h_dev))
    mark("pallas_compact(h=%d)" % h)
    n_pad2 = bucket_size(n + 1)
    ref_sa, ref_isa, ref_bwt = _ref_pad(index.sa, index.isa, index.bwt,
                                        jnp.int32(n), n_pad2)
    hb = bucket_size(h + 1)
    if hb < h_pad:
        t_h, pos_h, len_h, sml_h, chr_h = (
            arr[:hb] for arr in (t_h, pos_h, len_h, sml_h, chr_h))
    return DeviceHeadsResult(
        head_t=t_h, head_pos=pos_h, head_len=len_h, head_smaller=sml_h,
        head_char=chr_h, ref_sa=ref_sa, ref_isa=ref_isa, ref_bwt=ref_bwt,
        h=h, n=n, sn=sn, irreducible=0)
