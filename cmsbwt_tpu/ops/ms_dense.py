"""Dense matching statistics: one joint suffix sort of (reference ++
collection) replaces the per-character scan entirely.

TPU rationale (SURVEY.md §2 parallelism table): XLA:TPU executes sorts and
scans at memory bandwidth but serializes random gathers (~tens of M elem/s),
so the reference's pointer-chasing scan (ref ``CMS-BWT-functions.cpp:45-149``)
is reformulated as dense array passes:

1. Joint int32 string J = map(x) ++ map(SX) where collection separators get
   distinct ascending values in (1, 3)·(S+1) — exactly the reference's
   implicit ordering of document separators (doc-rank order, ref :630-645).
2. Prefix-doubling suffix sort of J (lax.sort rounds, rank history kept).
3. Adjacent joint LCP via the irreducible-PLCP theorem (Kärkkäinen–Manzini–
   Puglisi): only positions whose φ-predecessor pair is preceded by
   different chars need a rank-history lift; the rest follow from a
   ``cummax`` fill — O(runs · log m) gathers instead of O(m · log m).
4. For every collection suffix, the nearest reference suffixes above/below
   in joint order and the segment-min LCP to each (segmented scans). Then

   * ``mslen  = max(A, B)``  (A/B = LCP to nearest ref below/above),
   * ``smaller = B >= A``    (the reference picks the successor when it
     shares the maximal prefix, ref :62-76),
   * ``pos    = succ if B >= A else pred``

   which reproduces ``computeMSFactorAt``'s (pos, len, smaller) exactly —
   including insertion-point tie rules — because the reference's choice *is*
   the joint-order neighbor rule.

The ref-only SA/ISA/BWT fall out of the joint order by compaction, so this
one pipeline subsumes the separate index build for the scan-free path.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SEPARATOR
from ..index.device import n_levels

INT_MIN = -(2**31)
INT_MAX = 2**31 - 1
PAD_VAL = np.int32(2**30)  # sorts above every mapped char; pad suffixes
                           # cluster at the top of the joint SA (see below)


def build_joint_string(x_aug: np.ndarray, sx: np.ndarray,
                       n_pad: int, sn_pad: int) -> np.ndarray:
    """int32 joint string with doc-ranked separators, padded to stable
    bucket sizes (host, O(m)).

    Layout: [x (n) | pad | sx (sn) | pad]. Pad slots hold PAD_VAL: every
    pad suffix starts with the unique maximal symbol so the pad block is a
    contiguous range at the very top of the joint SA — above every real
    suffix and below nothing that matters — and real-suffix comparisons
    terminate at sentinels/separators before ever reading a pad char.
    """
    s = int((sx == SEPARATOR).sum())
    scale = np.int32(s + 1)
    j = np.full(n_pad + sn_pad, PAD_VAL, dtype=np.int32)
    j[: len(x_aug)] = x_aug.astype(np.int32) * scale
    jsx = sx.astype(np.int32) * scale
    sep_idx = np.nonzero(sx == SEPARATOR)[0]
    jsx[sep_idx] = 2 * scale + np.arange(s, dtype=np.int32)
    j[n_pad: n_pad + len(sx)] = jsx
    return j


@functools.partial(jax.jit, static_argnames=("m",))
def _joint_sa(j: jnp.ndarray, m: int):
    from ..index.device import suffix_array_device
    return suffix_array_device(j, m)


@functools.partial(jax.jit, static_argnames=("m",))
def _phi_and_irreducible(j, sa, m: int):
    """φ array and irreducible mask (text order)."""
    r = jnp.arange(m, dtype=jnp.int32)
    phi = jnp.zeros(m, jnp.int32).at[sa].set(
        jnp.concatenate([jnp.full(1, m, jnp.int32), sa[:-1]]))
    # text position i is reducible iff phi[i] valid and J[i-1] == J[phi[i]-1]
    pi = phi
    valid = (r > 0) & (pi > 0) & (pi < m)
    jm1 = j[jnp.clip(r - 1, 0, m - 1)]
    jp1 = j[jnp.clip(pi - 1, 0, m - 1)]
    reducible = valid & (jm1 == jp1)
    return phi, ~reducible


def _lift_pairs(history, a, b, m: int):
    """lcp(a, b) for position pairs via rank-history binary lifting."""
    levels = history.shape[0]
    h = jnp.zeros(a.shape, jnp.int32)

    def level(h, k):
        rk = history[k]
        va = a + h
        vb = b + h
        ok = (va < m) & (vb < m)
        eq = ok & (rk[jnp.clip(va, 0, m - 1)] == rk[jnp.clip(vb, 0, m - 1)])
        return h + jnp.where(eq, jnp.int32(1) << k, 0), None

    h, _ = jax.lax.scan(level, h,
                        jnp.arange(levels - 1, -1, -1, dtype=jnp.int32))
    return h


@functools.partial(jax.jit, static_argnames=("m",))
def _plcp_fill(irr_pos_plcp, m: int):
    """PLCP for all text positions from irreducible values.

    irr_pos_plcp: int32[m], plcp value at irreducible positions, INT_MIN
    elsewhere. PLCP[i] = max_j<=i (val[j] + j) - i.
    """
    r = jnp.arange(m, dtype=jnp.int32)
    best = jax.lax.cummax(jnp.where(irr_pos_plcp > INT_MIN,
                                    irr_pos_plcp + r, INT_MIN))
    return best - r


def _seg_min_scan(vals, reset, reverse=False):
    """Segmented running min via one ``cummax`` (associative_scan's generic
    lowering OOMs the compiler at tens of millions of elements).

    With segment ids s[r] = cumsum(reset), the segmented min equals
    ``BIG*s[r] - cummax(BIG*s - vals)[r]``: earlier segments' transformed
    values are smaller by at least BIG - max(vals) so they never win.
    """
    if reverse:
        return _seg_min_scan(vals[::-1], reset[::-1])[::-1]
    with jax.enable_x64(True):  # int64 survives canonicalization in-scope
        big = jnp.int64(1) << 32
        seg = jnp.cumsum(reset.astype(jnp.int64))
        t = big * seg - vals.astype(jnp.int64)
        out = (big * seg - jax.lax.cummax(t)).astype(jnp.int32)
    return out


@functools.partial(jax.jit, static_argnames=("m",))
def _neighbors(sa, ell, n, m: int):
    """For each joint SA slot: (pred ref pos, succ ref pos, A, B).

    ``n`` is a traced scalar (true reference length) so bucket-padded
    shapes share one compilation.
    """
    is_ref = sa < n
    idx = jnp.arange(m, dtype=jnp.int32)
    # nearest ref slot at or below
    p = jax.lax.cummax(jnp.where(is_ref, idx, -1))
    # nearest ref slot at or above (reverse cummin; sentinel m+1 = none)
    q = -jax.lax.cummax(jnp.where(is_ref, -idx,
                                  -jnp.int32(m + 1))[::-1])[::-1]
    pred_pos = sa[jnp.clip(p, 0, m - 1)]
    succ_pos = jnp.where(q < m, sa[jnp.clip(q, 0, m - 1)], -1)

    # A[r] = min ell over (p[r], r]; segments restart after ref slots:
    # reset at slot r when slot r-1 is ref
    reset_fwd = jnp.concatenate([jnp.ones(1, bool), is_ref[:-1]])
    a = _seg_min_scan(ell, reset_fwd)
    # B[r] = min ell over (r, q]; in reverse orientation use ell shifted
    # left by one (ell[r+1] = lcp(slot r, slot r+1)) and restart after ref
    # slots seen from the right
    ell_s = jnp.concatenate([ell[1:], jnp.zeros(1, jnp.int32)])
    reset_bwd = jnp.concatenate([is_ref[1:], jnp.ones(1, bool)])
    b = _seg_min_scan(ell_s, reset_bwd, reverse=True)
    b = jnp.where(q < m, b, INT_MIN)
    a = jnp.where(p >= 0, a, INT_MIN)
    return pred_pos, succ_pos, a, b


@dataclass
class DenseMSResult:
    pos: np.ndarray
    length: np.ndarray
    smaller: np.ndarray
    is_head: np.ndarray
    # extracted reference-only index (for the downstream merge engine)
    ref_sa: np.ndarray
    ref_isa: np.ndarray
    ref_bwt: np.ndarray
    irreducible: int
    m: int


@functools.partial(jax.jit, static_argnames=("m", "n_pad", "sn_pad"))
def _assemble(sa, pred_pos, succ_pos, a, b, n, sn, m: int, n_pad: int,
              sn_pad: int):
    """Scatter per-slot results into collection text order + extract the
    reference-only index (bucket-padded output shapes; sliced on host)."""
    is_ref = sa < n
    is_coll = (sa >= n_pad) & (sa < n_pad + sn)
    choose_succ = b >= a
    pos_slot = jnp.where(choose_succ, succ_pos, pred_pos)
    len_slot = jnp.maximum(a, b)
    # collection text order
    t = sa - n_pad
    pos = jnp.zeros(sn_pad, jnp.int32).at[
        jnp.where(is_coll, t, sn_pad)].set(pos_slot, mode="drop")
    length = jnp.zeros(sn_pad, jnp.int32).at[
        jnp.where(is_coll, t, sn_pad)].set(len_slot, mode="drop")
    smaller = jnp.zeros(sn_pad, bool).at[
        jnp.where(is_coll, t, sn_pad)].set(choose_succ, mode="drop")
    # reference-only extraction
    ref_rank = jnp.cumsum(is_ref.astype(jnp.int32)) - 1
    ref_sa = jnp.zeros(n_pad, jnp.int32).at[
        jnp.where(is_ref, ref_rank, n_pad)].set(sa, mode="drop")
    ridx = jnp.arange(n_pad, dtype=jnp.int32)
    ref_isa = jnp.zeros(n_pad, jnp.int32).at[
        jnp.where(ridx < n, ref_sa, n_pad)].set(ridx, mode="drop")
    return pos, length, smaller, ref_sa, ref_isa


@functools.partial(jax.jit, static_argnames=("n_pad", "sn_pad"))
def _postprocess(j, pos, length, smaller, n, sn, scale,
                 n_pad: int, sn_pad: int):
    """Device-side separator fixup, head detection, and bucket counts.

    Avoids shipping O(sn) arrays to the host (the device link runs at tens
    of MB/s): only O(n + H) data leaves the chip. Returns per-position
    (pos, length, smaller, is_head, head_rank) plus per-reference-position
    head/tail counts and the head count.
    """
    jc = jax.lax.dynamic_slice(j, (n_pad,), (sn_pad,))
    tidx = jnp.arange(sn_pad, dtype=jnp.int32)
    valid = tidx < sn
    sep = valid & (jc >= 2 * scale) & (jc < 3 * scale)
    pos = jnp.where(sep, n - 1, pos)
    length = jnp.where(sep, 0, length)
    prev = jnp.concatenate([jnp.full(1, -2, jnp.int32), pos[:-1]])
    is_head = valid & (pos != prev + 1)
    smaller = smaller & is_head
    heads_cnt = jnp.zeros(n_pad, jnp.int32).at[
        jnp.where(is_head, pos, n_pad)].add(1, mode="drop")
    tails_cnt = jnp.zeros(n_pad, jnp.int32).at[
        jnp.where(valid & ~is_head, pos, n_pad)].add(1, mode="drop")
    head_rank = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    h = head_rank[-1] + 1
    # head BWT char: previous collection char, cyclic (extract_heads rule);
    # recover the byte from the joint mapping (c*scale, separators -> 2)
    prev_j = jc[jnp.where(tidx > 0, tidx - 1, sn - 1)]
    char = (prev_j // scale).astype(jnp.uint8)
    return pos, length, smaller, is_head, head_rank, heads_cnt, tails_cnt, \
        h, char


@functools.partial(jax.jit, static_argnames=("sn_pad", "h_pad"))
def _compact_heads(pos, length, smaller, is_head, head_rank, char,
                   sn_pad: int, h_pad: int):
    """Order-preserving compaction of head records into h_pad slots."""
    tidx = jnp.arange(sn_pad, dtype=jnp.int32)
    dst = jnp.where(is_head, head_rank, h_pad)
    out_t = jnp.zeros(h_pad, jnp.int32).at[dst].set(tidx, mode="drop")
    out_pos = jnp.zeros(h_pad, jnp.int32).at[dst].set(pos, mode="drop")
    out_len = jnp.zeros(h_pad, jnp.int32).at[dst].set(length, mode="drop")
    out_sml = jnp.zeros(h_pad, bool).at[dst].set(smaller, mode="drop")
    out_chr = jnp.zeros(h_pad, jnp.uint8).at[dst].set(char, mode="drop")
    return out_t, out_pos, out_len, out_sml, out_chr


def ms_dense(x_aug: np.ndarray, sx: np.ndarray,
             bucketed: bool = True) -> DenseMSResult:
    """Full dense MS computation (single device)."""
    from ..utils.jaxcache import bucket_size, enable_compilation_cache
    enable_compilation_cache()
    n = len(x_aug)
    sn = len(sx)
    n_pad = bucket_size(n) if bucketed else n
    sn_pad = bucket_size(sn) if bucketed else sn
    m = n_pad + sn_pad
    j_host = build_joint_string(x_aug, sx, n_pad, sn_pad)
    j = jnp.asarray(j_host)
    n_t = jnp.int32(n)
    sn_t = jnp.int32(sn)
    sa, isa, history = _joint_sa(j, m)
    phi, irr = _phi_and_irreducible(j, sa, m)

    # lift only irreducible positions (host compaction for static shapes)
    irr_host = np.asarray(irr)
    irr_idx = np.nonzero(irr_host)[0].astype(np.int32)
    rho = len(irr_idx)
    pad = 1 << max(4, int(np.ceil(np.log2(max(rho, 1)))))
    irr_idx_p = np.full(pad, m, dtype=np.int32)
    irr_idx_p[:rho] = irr_idx
    ai = jnp.asarray(irr_idx_p)
    bi = phi[jnp.clip(ai, 0, m - 1)]
    bi = jnp.where(ai < m, bi, m)
    plcp_irr = _lift_pairs(history, ai, bi, m)
    # scatter to text order, fill reducible
    base = jnp.full(m, INT_MIN, jnp.int32).at[
        jnp.clip(ai, 0, m)].set(jnp.where(ai < m, plcp_irr, INT_MIN),
                                mode="drop")
    plcp = _plcp_fill(base, m)
    ell = plcp[sa]                              # adjacent joint LCP, SA order
    ell = ell.at[0].set(0)

    pred_pos, succ_pos, a, b = _neighbors(sa, ell, n_t, m)
    pos, length, smaller, ref_sa, ref_isa = _assemble(
        sa, pred_pos, succ_pos, a, b, n_t, sn_t, m, n_pad, sn_pad)

    pos = np.asarray(pos)[:sn].astype(np.int64)
    length = np.asarray(length)[:sn].astype(np.int64)
    smaller = np.asarray(smaller)[:sn].copy()
    ref_sa_np = np.asarray(ref_sa)[:n]
    ref_isa_np = np.asarray(ref_isa)[:n]
    ref_bwt = np.where(ref_sa_np > 0, x_aug[np.maximum(ref_sa_np - 1, 0)],
                       np.uint8(0)).astype(np.uint8)

    # separator pseudo-factors + head flags
    sep = sx == SEPARATOR
    pos[sep] = n - 1
    length[sep] = 0
    smaller[sep] = False
    prev = np.empty(sn, dtype=np.int64)
    prev[0] = -2
    prev[1:] = pos[:-1]
    is_head = pos != prev + 1
    smaller = smaller & is_head
    return DenseMSResult(pos=pos, length=length, smaller=smaller,
                         is_head=is_head, ref_sa=ref_sa_np,
                         ref_isa=ref_isa_np, ref_bwt=ref_bwt,
                         irreducible=rho, m=m)


@dataclass
class DenseHeadsResult:
    """Head records + bucket counts + reference index — everything the
    downstream merge engine needs, with only O(n + H) host transfer."""

    head_t: np.ndarray
    head_pos: np.ndarray
    head_len: np.ndarray
    head_smaller: np.ndarray
    head_char: np.ndarray
    heads_cnt: np.ndarray
    tails_cnt: np.ndarray
    ref_sa: np.ndarray
    ref_isa: np.ndarray
    ref_bwt: np.ndarray
    h: int
    sn: int
    irreducible: int


def ms_dense_heads(x_aug: np.ndarray, sx: np.ndarray,
                   bucketed: bool = True) -> DenseHeadsResult:
    """Dense MS with device-side head extraction (the production path)."""
    from ..utils.jaxcache import bucket_size, enable_compilation_cache
    enable_compilation_cache()
    n = len(x_aug)
    sn = len(sx)
    n_pad = bucket_size(n) if bucketed else n
    sn_pad = bucket_size(sn) if bucketed else sn
    m = n_pad + sn_pad
    s = int((sx == SEPARATOR).sum())
    j = jnp.asarray(build_joint_string(x_aug, sx, n_pad, sn_pad))
    n_t = jnp.int32(n)
    sn_t = jnp.int32(sn)
    scale = jnp.int32(s + 1)

    sa, isa, history = _joint_sa(j, m)
    phi, irr = _phi_and_irreducible(j, sa, m)
    irr_idx = np.nonzero(np.asarray(irr))[0].astype(np.int32)
    rho = len(irr_idx)
    pad = 1 << max(4, int(np.ceil(np.log2(max(rho, 1)))))
    irr_idx_p = np.full(pad, m, dtype=np.int32)
    irr_idx_p[:rho] = irr_idx
    ai = jnp.asarray(irr_idx_p)
    bi = jnp.where(ai < m, phi[jnp.clip(ai, 0, m - 1)], m)
    plcp_irr = _lift_pairs(history, ai, bi, m)
    base = jnp.full(m, INT_MIN, jnp.int32).at[
        jnp.clip(ai, 0, m)].set(jnp.where(ai < m, plcp_irr, INT_MIN),
                                mode="drop")
    plcp = _plcp_fill(base, m)
    ell = plcp[sa].at[0].set(0)

    pred_pos, succ_pos, a, b = _neighbors(sa, ell, n_t, m)
    pos, length, smaller, ref_sa, ref_isa = _assemble(
        sa, pred_pos, succ_pos, a, b, n_t, sn_t, m, n_pad, sn_pad)

    (pos, length, smaller, is_head, head_rank, heads_cnt, tails_cnt, h_dev,
     char) = _postprocess(j, pos, length, smaller, n_t, sn_t, scale,
                          n_pad, sn_pad)
    h = int(np.asarray(h_dev))
    h_pad = 1 << max(4, int(np.ceil(np.log2(max(h, 1)))))
    out_t, out_pos, out_len, out_sml, out_chr = _compact_heads(
        pos, length, smaller, is_head, head_rank, char, sn_pad, h_pad)

    ref_sa_np = np.asarray(ref_sa)[:n]
    ref_bwt = np.where(ref_sa_np > 0, x_aug[np.maximum(ref_sa_np - 1, 0)],
                       np.uint8(0)).astype(np.uint8)
    return DenseHeadsResult(
        head_t=np.asarray(out_t)[:h].astype(np.int64),
        head_pos=np.asarray(out_pos)[:h].astype(np.int64),
        head_len=np.asarray(out_len)[:h].astype(np.int64),
        head_smaller=np.asarray(out_sml)[:h],
        head_char=np.asarray(out_chr)[:h],
        heads_cnt=np.asarray(heads_cnt)[:n].astype(np.int64),
        tails_cnt=np.asarray(tails_cnt)[:n].astype(np.int64),
        ref_sa=ref_sa_np,
        ref_isa=np.asarray(ref_isa)[:n],
        ref_bwt=ref_bwt,
        h=h, sn=sn, irreducible=rho)
