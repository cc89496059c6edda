"""Device matching-statistics scan: many suffix cursors advanced in lockstep
(SURVEY.md §7.4, the replacement for the reference's sequential hot loops
ref ``CMS-BWT-functions.cpp:45-149,357-403``).

Because MS values (pos, len, smaller) at a position are pure functions of
(index, collection) — the carried interval state is only an accelerator —
the collection is split into ``lanes`` contiguous chunks scanned
independently and *exactly* (no stitching corrections): a lane entering a
chunk cold recomputes the first factor from the root interval and lands on
the identical canonical state. Head flags are a global neighbor-compare
afterwards.

Each lane is a little state machine:

* EXTEND / non-singleton: one char per step via branchless lower/upper
  bound over the SA interval (the two binary searches of the reference,
  ref :94-149, fused into one round loop);
* EXTEND / singleton: W chars per step via windowed text compare
  (the reference's char-at-a-time singleton path, ref :53-61);
* EMIT: after a factor, PLCP-skip bursts emit up to W guaranteed tails per
  step with zero text access (the "compressed" trick, ref :381-391), then
  the interval is re-expanded with PSV/NSV sparse-table queries
  (adjustInterval/contractLeft, ref :11-43).

All lanes run every phase masked — throughput comes from lane count.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SEPARATOR
from ..index.device import DeviceIndex, nsv_device, psv_device

MODE_EXTEND = 0
MODE_SKIP = 1


@dataclass
class MSDeviceOut:
    pos: np.ndarray
    length: np.ndarray
    smaller: np.ndarray
    is_head: np.ndarray


def _bs_rounds(n: int) -> int:
    r = 1
    while (1 << r) < n:
        r += 1
    return r + 1


def _key_at(x_padded, sa, m, offset, n):
    """x[SA[m] + offset] with clamping (reads x_padded[n]=0 legally)."""
    s = sa[jnp.clip(m, 0, n - 1)]
    return x_padded[jnp.clip(s + offset, 0, x_padded.shape[0] - 1)]


@functools.partial(jax.jit,
                   static_argnames=("n", "chunk_len", "window", "sn"))
def ms_scan_kernel(x_padded, sa, isa, plcp, jump, sx_padded,
                   chunk_starts, *, n: int, sn: int, chunk_len: int,
                   window: int):
    """Run the lane state machine; returns (pos, len, smaller) [L, chunk_len].

    chunk_starts: int32[L] absolute start of each lane's chunk (contiguous
    partition of [0, sn)).
    """
    L = chunk_starts.shape[0]
    W = window
    ROUNDS = _bs_rounds(n)
    karange = jnp.arange(W, dtype=jnp.int32)

    def cond(state):
        return jnp.any(~state["done"])

    def body(state):
        trel = state["trel"]
        length = state["length"]
        lb = state["lb"]
        rb = state["rb"]
        pos = state["pos"]
        mode = state["mode"]
        done = state["done"]
        out_pos = state["out_pos"]
        out_len = state["out_len"]
        out_sml = state["out_sml"]

        t_abs = chunk_starts + trel
        active = ~done
        ext = active & (mode == MODE_EXTEND)
        skp = active & (mode == MODE_SKIP)

        # ---------- EXTEND: separator pseudo-emit ----------
        cur_char = sx_padded[jnp.clip(t_abs, 0, sn + W - 1)]
        sep_emit = ext & (length == 0) & (cur_char == SEPARATOR)

        # ---------- EXTEND: singleton windowed compare ----------
        singleton = ext & ~sep_emit & (lb == rb)
        j_abs = t_abs + length
        win_sx = sx_padded[jnp.clip(j_abs[:, None] + karange[None, :],
                                    0, sn + W - 1)]
        win_x = x_padded[jnp.clip(pos[:, None] + length[:, None]
                                  + karange[None, :],
                                  0, x_padded.shape[0] - 1)]
        neq = win_sx != win_x
        any_neq = jnp.any(neq, axis=1)
        d = jnp.argmax(neq, axis=1).astype(jnp.int32)
        d = jnp.where(any_neq, d, W)
        sgl_matched = d                                  # chars matched now
        sgl_final = singleton & any_neq                  # factor ends
        sgl_smaller = win_x[jnp.arange(L), jnp.clip(d, 0, W - 1)] > \
            win_sx[jnp.arange(L), jnp.clip(d, 0, W - 1)]

        # ---------- EXTEND: non-singleton binary search ----------
        nons = ext & ~sep_emit & (lb != rb)
        c = sx_padded[jnp.clip(j_abs, 0, sn + W - 1)]

        def bs_round(carry, _):
            lo1, hi1, lo2, hi2 = carry
            # lower bound: first m with key >= c
            m1 = (lo1 + hi1) >> 1
            k1 = _key_at(x_padded, sa, m1, length, n)
            go1 = k1 < c
            lo1n = jnp.where(go1, m1 + 1, lo1)
            hi1n = jnp.where(go1, hi1, m1)
            a1 = lo1 < hi1
            lo1 = jnp.where(a1, lo1n, lo1)
            hi1 = jnp.where(a1, hi1n, hi1)
            # upper bound: first m with key > c
            m2 = (lo2 + hi2) >> 1
            k2 = _key_at(x_padded, sa, m2, length, n)
            go2 = k2 <= c
            lo2n = jnp.where(go2, m2 + 1, lo2)
            hi2n = jnp.where(go2, hi2, m2)
            a2 = lo2 < hi2
            lo2 = jnp.where(a2, lo2n, lo2)
            hi2 = jnp.where(a2, hi2n, hi2)
            return (lo1, hi1, lo2, hi2), None

        (lower, _, upper, _), _ = jax.lax.scan(
            bs_round, (lb, rb + 1, lb, rb + 1), None, length=ROUNDS)
        bs_found = nons & (lower < upper)
        # not found: insertion point = lower (ref :65-76)
        insertion = lower
        at_end = insertion == rb + 1
        bs_maxmatch = jnp.where(at_end, rb, insertion)
        bs_smaller = ~at_end
        bs_final = nons & (lower >= upper)

        # ---------- apply EXTEND updates ----------
        new_lb = jnp.where(bs_found, lower, lb)
        new_rb = jnp.where(bs_found, upper - 1, rb)
        new_pos = jnp.where(bs_found, sa[jnp.clip(lower, 0, n - 1)], pos)
        new_len = length + jnp.where(bs_found, 1, 0) \
            + jnp.where(singleton, sgl_matched, 0)
        # factor finalized this step?
        final = sgl_final | bs_final
        fpos = jnp.where(bs_final,
                         sa[jnp.clip(bs_maxmatch, 0, n - 1)], new_pos)
        fsml = jnp.where(bs_final, bs_smaller, sgl_smaller)

        # emit factor (and separator pseudo-factor)
        emit_now = final | sep_emit
        e_pos = jnp.where(sep_emit, n - 1, fpos)
        e_len = jnp.where(sep_emit, 0, new_len)
        e_sml = jnp.where(sep_emit, False, fsml)
        row = jnp.arange(L)
        col = jnp.where(emit_now, trel, chunk_len)  # OOB col drops the write
        out_pos = out_pos.at[row, col].set(e_pos, mode="drop")
        out_len = out_len.at[row, col].set(e_len, mode="drop")
        out_sml = out_sml.at[row, col].set(e_sml, mode="drop")

        trel = trel + jnp.where(emit_now, 1, 0)
        # after separator: reset; after factor: len-- and go to SKIP stage
        new_len = jnp.where(sep_emit, 0, new_len - jnp.where(final, 1, 0))
        new_lb = jnp.where(sep_emit, 0, new_lb)
        new_rb = jnp.where(sep_emit, n - 1, new_rb)
        new_pos = jnp.where(sep_emit, n - 1, jnp.where(final, fpos, new_pos))
        mode = jnp.where(final, MODE_SKIP, mode)

        # ---------- SKIP stage: PLCP burst + contract ----------
        # (runs for lanes already in SKIP mode at step entry)
        sk_sgl = skp & (lb == rb)
        pw = plcp[jnp.clip(pos[:, None] + 1 + karange[None, :], 0, n - 1)]
        okk = (length[:, None] - karange[None, :]) > pw
        # also stop at chunk capacity
        cap = chunk_len - trel
        run_all = jnp.argmin(okk, axis=1).astype(jnp.int32)
        run_all = jnp.where(jnp.all(okk, axis=1), W, run_all)
        r = jnp.where(sk_sgl, jnp.minimum(run_all, cap), 0)
        # emit r tails
        tail_cols = trel[:, None] + karange[None, :]
        tail_mask = sk_sgl[:, None] & (karange[None, :] < r[:, None])
        cols2 = jnp.where(tail_mask, tail_cols, chunk_len)  # OOB -> dropped
        rows2 = jnp.broadcast_to(row[:, None], (L, W))
        t_pos = pos[:, None] + 1 + karange[None, :]
        t_len = length[:, None] - karange[None, :]
        out_pos = out_pos.at[rows2, cols2].set(t_pos, mode="drop")
        out_len = out_len.at[rows2, cols2].set(t_len, mode="drop")
        out_sml = out_sml.at[rows2, cols2].set(False, mode="drop")
        trel = trel + r
        pos = jnp.where(sk_sgl, pos + r, pos)
        length = jnp.where(sk_sgl, length - r, length)
        burst_full = sk_sgl & (r == W) & (cap > W)

        # contract: singleton lanes re-expand around ISA[pos+1]; wide lanes
        # contractLeft (ref :34-43); both via PSV/NSV
        do_adjust = skp & ~burst_full
        adj_sgl = do_adjust & (lb == rb)
        adj_wide = do_adjust & (lb != rb)
        suflo = sa[jnp.clip(lb, 0, n - 1)]
        sufhi = sa[jnp.clip(rb, 0, n - 1)]
        at_root = adj_wide & ((suflo == n - 1) | (sufhi == n - 1))
        qlo = jnp.where(adj_sgl,
                        isa[jnp.clip(pos + 1, 0, n - 1)],
                        isa[jnp.clip(suflo + 1, 0, n - 1)])
        qhi = jnp.where(adj_sgl,
                        isa[jnp.clip(pos + 1, 0, n - 1)],
                        isa[jnp.clip(sufhi + 1, 0, n - 1)])
        p = psv_device(jump, qlo, length, n)
        p = jnp.where(p == -1, 0, p)
        q = nsv_device(jump, qhi + 1, length, n)
        q = jnp.where(q == -1, n - 1, q - 1)
        adj_apply = do_adjust & ~at_root
        lb = jnp.where(adj_apply, p, jnp.where(at_root, 0, new_lb))
        rb = jnp.where(adj_apply, q, jnp.where(at_root, n - 1, new_rb))
        pos = jnp.where(do_adjust, sa[jnp.clip(lb, 0, n - 1)], pos)
        mode = jnp.where(do_adjust, MODE_EXTEND, mode)

        # merge EXTEND-phase state for lanes that were in EXTEND
        length = jnp.where(ext, new_len, length)
        lb = jnp.where(ext, new_lb, lb)
        rb = jnp.where(ext, new_rb, rb)
        pos = jnp.where(ext, new_pos, pos)

        done = done | (trel >= chunk_len) | (chunk_starts + trel >= sn)
        return {
            "trel": trel, "length": length, "lb": lb, "rb": rb, "pos": pos,
            "mode": mode, "done": done, "out_pos": out_pos,
            "out_len": out_len, "out_sml": out_sml,
        }

    L0 = chunk_starts.shape[0]
    init = {
        "trel": jnp.zeros(L0, jnp.int32),
        "length": jnp.zeros(L0, jnp.int32),
        "lb": jnp.zeros(L0, jnp.int32),
        "rb": jnp.full(L0, n - 1, jnp.int32),
        "pos": jnp.full(L0, n - 1, jnp.int32),
        "mode": jnp.zeros(L0, jnp.int32),
        "done": chunk_starts >= sn,
        "out_pos": jnp.zeros((L0, chunk_len), jnp.int32),
        "out_len": jnp.zeros((L0, chunk_len), jnp.int32),
        "out_sml": jnp.zeros((L0, chunk_len), jnp.bool_),
    }
    final = jax.lax.while_loop(cond, body, init)
    return final["out_pos"], final["out_len"], final["out_sml"]


def ms_scan_device(index: DeviceIndex, sx: np.ndarray, lanes: int = 256,
                   window: int = 128) -> MSDeviceOut:
    """Scan the collection with ``lanes`` parallel cursors; returns host
    arrays compatible with the host pipeline (MSArrays fields)."""
    sn = int(len(sx))
    n = index.n
    lanes = max(1, min(lanes, sn))
    chunk_len = -(-sn // lanes)
    chunk_starts = (np.arange(lanes) * chunk_len).astype(np.int32)
    sx_padded = jnp.concatenate([
        jnp.asarray(sx), jnp.zeros(window, jnp.uint8)])
    out_pos, out_len, out_sml = ms_scan_kernel(
        index.x_padded, index.sa, index.isa, index.plcp, index.jump,
        sx_padded, jnp.asarray(chunk_starts), n=n, sn=sn,
        chunk_len=chunk_len, window=window)
    pos = np.asarray(out_pos).reshape(-1)[:sn].astype(np.int64)
    length = np.asarray(out_len).reshape(-1)[:sn].astype(np.int64)
    smaller = np.asarray(out_sml).reshape(-1)[:sn]
    prev = np.empty(sn, dtype=np.int64)
    prev[0] = -2
    prev[1:] = pos[:-1]
    is_head = pos != prev + 1
    # `smaller` is only meaningful at heads (tails emitted by the reference's
    # PLCP skip loop carry no smaller bit); canonicalize so chunk-boundary
    # restarts compare equal to the sequential scan
    smaller = smaller & is_head
    return MSDeviceOut(pos=pos, length=length, smaller=smaller,
                       is_head=is_head)
