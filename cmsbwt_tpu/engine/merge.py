"""Output merge: interleave tail runs with head chars per reference-SA-rank
bucket and emit the collection BWT, plain (ref ``CMS-BWT-functions.cpp:
939-1002``) or run-length encoded (ref ``:1003-1085``).

Represented as a run list (length, char) assembled per bucket:

* prelude: BWTheads[0..D-2] (separator-prefixed suffixes sort first, ref :946)
* tails-only bucket at SA rank i: one run (buckets[i], refBWT[i])
* mixed bucket: per class slot: (counterSmallerThanHead[slot], refBWT[i]) then
  the next head char; after the classes, the residual tails.

The plain writer emits the residual once per bucket (ref :986-994). The RLE
writer of the reference instead emits, after *every* class, a run equal to
the not-yet-emitted entry count of the bucket without consuming it
(ref :1069-1078 — the residual block sits inside the subBucket loop and
``bucketsForExpandedBWT[i]`` is never zeroed). For multi-class mixed buckets
the two outputs therefore differ; ``rle_quirk=True`` replicates that
behavior byte-for-byte, ``False`` emits RLE(plain).
"""
from __future__ import annotations

import numpy as np

from ..index.host import ReferenceIndex
from .heads import ClassArrays
from .ranking import RankedHeads


def bucket_counts(index: ReferenceIndex, ms_pos: np.ndarray,
                  is_head: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per reference text position: (#heads, #tails) (ref
    bucketsForExpandedBWT accounting :368-377, sign-decoded)."""
    n = index.n
    heads_cnt = np.bincount(ms_pos[is_head], minlength=n).astype(np.int64)
    tails_cnt = np.bincount(ms_pos[~is_head], minlength=n).astype(np.int64)
    return heads_cnt, tails_cnt


def build_runs(index: ReferenceIndex, classes: ClassArrays,
               ranked: RankedHeads, counter: np.ndarray,
               heads_cnt: np.ndarray, tails_cnt: np.ndarray,
               d: int, rle_quirk: bool) -> tuple[np.ndarray, np.ndarray]:
    """Assemble the output as (run_len int64[], run_char uint8[]).

    With ``rle_quirk`` the per-class phantom residual runs of the reference
    RLE writer are inserted (they add bytes, exactly as the reference does).
    """
    n = index.n
    sa = index.sa
    ref_bwt = index.bwt
    run_len: list[np.ndarray] = []
    run_char: list[np.ndarray] = []

    # prelude: head BWT chars of the D-1 separator suffixes
    prelude = ranked.bwt_heads[: d - 1]
    run_len.append(np.ones(d - 1, dtype=np.int64))
    run_char.append(prelude)

    # class ranges per position (classes.pos is sorted)
    # For each SA rank i in [1, n): bucket at pos sa[i].
    pos_order = sa[1:].astype(np.int64)
    hc = heads_cnt[pos_order]
    tc = tails_cnt[pos_order]
    bwt_c = ref_bwt[1:]

    simple = hc == 0
    # Pre-compute per-mixed-bucket class ranges
    mixed_idx = np.nonzero(~simple)[0]

    # iterate buckets in SA-rank order, vectorized per bucket for the mixed
    # ones (mixed buckets are bounded by the number of distinct head
    # positions, typically << n)
    # Build a run segment per bucket and concatenate in order. To stay
    # vectorized we build per-bucket segments only for mixed buckets and
    # fill simple buckets in bulk.
    seg_len: list[np.ndarray] = []
    seg_char: list[np.ndarray] = []
    # strategy: emit buckets in SA order; collect contiguous runs of simple
    # buckets between mixed ones in single vectorized chunks
    prev = 0
    head_counter = d - 1
    cls_pos = classes.pos
    for mi in mixed_idx:
        if mi > prev:
            seg_len.append(tc[prev:mi])
            seg_char.append(bwt_c[prev:mi])
        p = int(pos_order[mi])
        c_lo = int(np.searchsorted(cls_pos, p, side="left"))
        c_hi = int(np.searchsorted(cls_pos, p, side="right"))
        slo = int(ranked.slot_base[c_lo])
        shi = int(ranked.slot_base[c_hi])
        nslots = shi - slo
        cchar = bwt_c[mi]
        if not rle_quirk:
            # [counter, headchar] per slot + one residual
            l2 = np.empty(2 * nslots + 1, dtype=np.int64)
            ch2 = np.empty(2 * nslots + 1, dtype=np.uint8)
            l2[0:2 * nslots:2] = counter[slo:shi]
            ch2[0:2 * nslots:2] = cchar
            l2[1:2 * nslots:2] = 1
            ch2[1:2 * nslots:2] = ranked.bwt_heads[
                head_counter: head_counter + nslots]
            emitted = int(counter[slo:shi].sum()) + nslots
            total = int(hc[mi] + tc[mi])
            l2[2 * nslots] = total - emitted
            ch2[2 * nslots] = cchar
        else:
            # quirk: after every class, a phantom run of the not-yet-emitted
            # count (which is not consumed)
            parts_l = []
            parts_c = []
            emitted = 0
            total = int(hc[mi] + tc[mi])
            hctr = head_counter
            for c in range(c_lo, c_hi):
                a = int(ranked.slot_base[c])
                bnd = int(ranked.slot_base[c + 1])
                m = bnd - a
                l3 = np.empty(2 * m, dtype=np.int64)
                c3 = np.empty(2 * m, dtype=np.uint8)
                l3[0::2] = counter[a:bnd]
                c3[0::2] = cchar
                l3[1::2] = 1
                c3[1::2] = ranked.bwt_heads[hctr: hctr + m]
                hctr += m
                emitted += int(counter[a:bnd].sum()) + m
                parts_l.append(l3)
                parts_c.append(c3)
                rem = total - emitted
                if rem != 0:
                    parts_l.append(np.asarray([rem], dtype=np.int64))
                    parts_c.append(np.asarray([cchar], dtype=np.uint8))
            l2 = np.concatenate(parts_l) if parts_l else np.zeros(0, np.int64)
            ch2 = np.concatenate(parts_c) if parts_c else np.zeros(0, np.uint8)
        seg_len.append(l2)
        seg_char.append(ch2)
        head_counter += nslots
        prev = mi + 1
    if prev < len(pos_order):
        seg_len.append(tc[prev:])
        seg_char.append(bwt_c[prev:])

    run_len.extend(seg_len)
    run_char.extend(seg_char)
    rl = np.concatenate(run_len) if run_len else np.zeros(0, np.int64)
    rc = np.concatenate(run_char) if run_char else np.zeros(0, np.uint8)
    keep = rl > 0
    return rl[keep], rc[keep]


def runs_to_plain(run_len: np.ndarray, run_char: np.ndarray) -> bytes:
    return np.repeat(run_char, run_len).tobytes()


def runs_to_rle(run_len: np.ndarray, run_char: np.ndarray) -> bytes:
    """Merge adjacent equal-char runs, emit (uint64 len, uint8 char) records
    (ref :1003-1085; the initial prevChar=0/runLength=0 state never emits an
    empty first record because BWT chars are >= 2)."""
    if len(run_len) == 0:
        return b"\x00" * 8 + b"\x00"  # ref writes the (0, 0) initial state
    new = np.ones(len(run_char), dtype=bool)
    new[1:] = run_char[1:] != run_char[:-1]
    gid = np.cumsum(new) - 1
    merged_len = np.zeros(int(gid[-1]) + 1, dtype=np.int64)
    np.add.at(merged_len, gid, run_len)
    merged_len = merged_len.astype(np.uint64)
    merged_char = run_char[new]
    out = np.zeros(len(merged_len) * 9, dtype=np.uint8)
    out[: len(merged_len) * 9].reshape(-1, 9)[:, :8] = (
        merged_len[:, None] >> (8 * np.arange(8, dtype=np.uint64))[None, :]
    ).astype(np.uint8)
    out.reshape(-1, 9)[:, 8] = merged_char
    return out.tobytes()
