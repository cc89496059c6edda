"""Mesh-native dense execution: the blocked dense pipeline as ONE
``shard_map`` program per wave of blocks, with collectives carrying the
cross-block coupling (SURVEY.md §2 parallelism checklist, §7.7).

Layout and collectives:

* mesh axis ``data``: one collection block per device; the augmented
  reference is replicated (the small-reference regime — the large regime
  shards the index, see parallel/sharded_index.py);
* ``ppermute`` shifts each block's final match position to the next device:
  the successor block's first-position head flag depends on it (the
  ``pos != prevPos + 1`` rule, ref CMS-BWT-functions.cpp:360) — the
  distributed form of the sequential chain the reference threads through
  its parse loop;
* ``psum`` reduces the wave's violation / capacity-overflow flags and rho
  total so the host consumes ONE replicated scalar vector per wave instead
  of one fetch per device.

Static shapes: every block in a wave shares (bs_pad, rho_cap, h_cap), so
the whole wave is a single compiled program; short final waves run with
empty dummy blocks (emit_len = 0 -> zero heads). Blocks whose adaptive
context was too small, or whose irreducible/head counts exceed the static
caps, are re-run through the sequential per-block path
(ops/ms_dense.ms_dense_heads_blocked handles per-block retry) — rare, and
exact either way.

Multi-host scaffolding: ``distributed.maybe_initialize`` brings up
``jax.distributed`` from standard env vars; the mesh then spans all
processes' devices and each process feeds its addressable blocks.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SEPARATOR
from ..ops import ms_dense as MD
from ..utils.xfer import get_global as _gg


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "n_pad", "bs_pad", "rho_cap", "h_cap"))
def _wave_program(mesh, x_u8, sx_blocks, len_blk, emit_len, sep_base,
                  prev_pos0, prev_b0, n,
                  n_pad: int, bs_pad: int, rho_cap: int, h_cap: int):
    """One wave: every device runs the full dense block pipeline on its
    block; returns per-device compacted heads + replicated wave scalars."""
    m = n_pad + bs_pad

    def body(x_u8, sx_blk, len_blk, emit_len, sep_base, prev_pos0, prev_b0):
        ln = len_blk[0]
        em = emit_len[0]
        b, sp = MD._build_joint_device(
            x_u8, sx_blk[0], n, ln, sep_base[0], n_pad, bs_pad)
        sa, isa, hist, pack8, k_star, split_lv = MD._joint_sa(b, sp, m)
        stats, ai_all, bi_all, lv_all = MD._irreducible_slots(
            b, sp, sa, isa, split_lv, n, ln, m, n_pad)
        rho = stats[0]
        ell = MD._lift_and_fill(hist, pack8, ai_all, bi_all, lv_all, isa,
                                m, rho_cap)
        pred_pos, succ_pos, a, bnb = MD._neighbors(sa, ell, n, m)
        pos, length, smaller, _, _ = MD._assemble(
            sa, pred_pos, succ_pos, a, bnb, n, ln, m, n_pad, bs_pad)
        # cross-block chain: my postprocessed last position -> next device.
        # (pos of a separator is fixed up to n-1 before the chain test.)
        bc_last = b[n_pad + jnp.maximum(em - 1, 0)]
        is_sep_last = bc_last == jnp.uint8(2)
        my_last = jnp.where(is_sep_last, n - 1,
                            pos[jnp.maximum(em - 1, 0)])
        ndev = jax.lax.axis_size("data")
        perm = [(i, i + 1) for i in range(ndev - 1)]
        from_left = jax.lax.ppermute(my_last, "data", perm)
        prev_pos = jnp.where(jax.lax.axis_index("data") == 0,
                             prev_pos0[0], from_left)
        (pos, length, smaller, is_head, char,
         scalars) = MD._postprocess_block(
            b, pos, length, smaller, n, em, prev_pos,
            prev_b0[0], n_pad, bs_pad)
        h, viol, last_pos = scalars[0], scalars[1], scalars[2]
        out_t, out_pos, out_len, out_sml, out_chr = MD._compact_heads(
            pos, length, smaller, is_head, char, bs_pad, h_cap)
        over = (h > h_cap) | (rho > rho_cap)
        # wave health: ONE replicated scalar fetch for the host
        any_viol = jax.lax.psum((viol > 0).astype(jnp.int32), "data")
        any_over = jax.lax.psum(over.astype(jnp.int32), "data")
        rho_sum = jax.lax.psum(rho, "data")
        per_dev = jnp.stack([h, viol, last_pos, rho,
                             over.astype(jnp.int32)])[None]
        wave = jnp.stack([any_viol, any_over, rho_sum])
        return (out_t[None], out_pos[None], out_len[None],
                out_sml.astype(jnp.int32)[None], out_chr[None],
                per_dev, wave)

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                  P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                   P("data"), P()),
        check_vma=False)
    return shard(body)(x_u8, sx_blocks, len_blk, emit_len, sep_base,
                       prev_pos0, prev_b0)


def ms_dense_heads_mesh(x_aug: np.ndarray, sx: np.ndarray,
                        block_chars: int, ctx_chars: int | None = None,
                        mesh: Mesh | None = None,
                        rho_cap_frac: int = 4, h_cap_frac: int = 8
                        ) -> MD.DenseHeadsResult:
    """Dense MS over a device mesh: waves of ``ndev`` blocks, one
    shard_map program per wave (see module docstring)."""
    from ..utils.jaxcache import bucket_size, enable_compilation_cache
    enable_compilation_cache()
    if mesh is None:
        mesh = make_mesh()
    ndev = int(mesh.devices.size)
    n = len(x_aug)
    sn = len(sx)
    if ctx_chars is None:
        ctx_chars = max(1 << 16, block_chars // 8)
    sep_cum = np.cumsum(sx == SEPARATOR)
    n_pad = bucket_size(n)
    bs_pad = bucket_size(block_chars + ctx_chars)
    if bs_pad == block_chars + ctx_chars:
        bs_pad = bucket_size(bs_pad + 1)  # joint must end with a special
    m = n_pad + bs_pad
    rho_cap = min(MD._pow2_pad(-(-m // rho_cap_frac)), m)
    h_cap = min(MD._pow2_pad(-(-bs_pad // h_cap_frac)), bs_pad)

    x_u8 = np.zeros(n_pad, np.uint8)
    x_u8[:n] = x_aug
    x_dev = jax.device_put(jnp.asarray(x_u8), NamedSharding(mesh, P()))
    shard_rows = NamedSharding(mesh, P("data"))

    starts = list(range(0, sn, block_chars))
    fallback: list[int] = []   # block indices re-run sequentially
    parts: dict[int, dict] = {}
    prev_pos0_host = -2        # chain state entering each wave
    total_rho = 0

    for w0 in range(0, len(starts), ndev):
        wave = starts[w0:w0 + ndev]
        sx_rows = np.zeros((ndev, bs_pad), np.uint8)
        len_blk = np.zeros(ndev, np.int32)
        emit = np.zeros(ndev, np.int32)
        sep_base = np.zeros(ndev, np.int32)
        prev_b0 = np.zeros(ndev, np.int32)
        for i, b0 in enumerate(wave):
            e = min(block_chars, sn - b0)
            end = min(b0 + e + ctx_chars, sn)
            blk = sx[b0:end]
            sx_rows[i, : len(blk)] = blk
            len_blk[i] = len(blk)
            emit[i] = e
            sep_base[i] = int(sep_cum[b0 - 1]) if b0 > 0 else 0
            prev_b0[i] = SEPARATOR if b0 == 0 else int(sx[b0 - 1])
        prev0 = np.full(ndev, -2, np.int32)
        prev0[0] = prev_pos0_host

        put = lambda a: jax.device_put(jnp.asarray(a), shard_rows)
        (t_r, pos_r, len_r, sml_r, chr_r, per_dev, wave_sc) = _wave_program(
            mesh, x_dev, put(sx_rows), put(len_blk), put(emit),
            put(sep_base), put(prev0), put(prev_b0),
            jnp.int32(n),
            n_pad, bs_pad, rho_cap, h_cap)
        any_viol, any_over, _ = (int(v) for v in np.asarray(wave_sc))
        pd = _gg(per_dev)  # [ndev, 5]
        if jax.process_count() > 1:
            # multi-process: fetch the whole wave with SYMMETRIC
            # collectives — the per-row addressable-shard fast path would
            # let processes disagree on whether an allgather runs (the
            # 2-process deadlock tests/test_distributed_2proc.py guards)
            t_r, pos_r, len_r, sml_r, chr_r = (
                _gg(t_r), _gg(pos_r), _gg(len_r), _gg(sml_r), _gg(chr_r))
        for i, b0 in enumerate(wave):
            h_i, viol_i, last_i, rho_i, over_i = (int(v) for v in pd[i])
            end = min(b0 + int(emit[i]) + ctx_chars, sn)
            if (viol_i and end < sn) or over_i:
                fallback.append(b0)
            else:
                parts[b0] = dict(
                    t=_row(t_r, i)[:h_i].astype(np.int64) + b0,
                    pos=_row(pos_r, i)[:h_i].astype(np.int64),
                    length=_row(len_r, i)[:h_i].astype(np.int64),
                    smaller=_row(sml_r, i)[:h_i] != 0,
                    char=_row(chr_r, i)[:h_i].astype(np.uint8),
                    last_pos=last_i)
                total_rho += rho_i
        prev_pos0_host = int(pd[len(wave) - 1][2])

    if fallback:
        # a static cap (context / rho_cap / h_cap) could not hold some
        # block: re-run through the sequential adaptive-context scanner —
        # rare, and exact either way
        return MD.ms_dense_heads_blocked(x_aug, sx, block_chars=block_chars,
                                         ctx_chars=ctx_chars)

    # reference index: recovered from any block's joint order — run the
    # small ref-export program once (the reference part of the joint order
    # is block-independent)
    ref_sa, ref_isa = _export_ref_index(x_aug, n_pad)
    ref_bwt = np.where(ref_sa > 0, x_aug[np.maximum(ref_sa - 1, 0)],
                       np.uint8(0)).astype(np.uint8)

    # stitch: block-first provisional heads that chain from the previous
    # block's last position are tails (host-side, one comparison per block)
    ordered = [parts[b0] for b0 in starts]
    for k in range(1, len(ordered)):
        r = ordered[k]
        prev_last = ordered[k - 1]["last_pos"]
        if len(r["t"]) and r["t"][0] == starts[k] and \
                r["pos"][0] == prev_last + 1:
            for key in ("t", "pos", "length", "smaller", "char"):
                r[key] = r[key][1:]

    cat = lambda k, d: (np.concatenate([r[k] for r in ordered])
                        if ordered else np.zeros(0, d))
    head_t = cat("t", np.int64)
    return MD.DenseHeadsResult(
        head_t=head_t, head_pos=cat("pos", np.int64),
        head_len=cat("length", np.int64),
        head_smaller=cat("smaller", bool), head_char=cat("char", np.uint8),
        ref_sa=ref_sa, ref_isa=ref_isa, ref_bwt=ref_bwt,
        h=len(head_t), sn=sn, irreducible=total_rho)


def _row(sharded, i):
    """Fetch one device's row of a P('data')-sharded [ndev, h_cap] output
    without gathering the whole array (multi-process callers pre-gather
    and pass numpy)."""
    if isinstance(sharded, np.ndarray):
        return sharded[i]
    for s in sharded.addressable_shards:
        if s.index[0].start == i or (s.index[0].start is None and i == 0):
            return np.asarray(s.data)[0]
    return _gg(sharded)[i]  # cross-process fallback (gathers the wave)


def _export_ref_index(x_aug, n_pad):
    """SA/ISA of the augmented reference via the joint pipeline with an
    empty collection block (runs once, single device)."""
    n = len(x_aug)
    x_u8 = np.zeros(n_pad, np.uint8)
    x_u8[:n] = x_aug
    bs_pad = 1 << 12
    b, sp = MD._build_joint_device(
        jnp.asarray(x_u8), jnp.zeros(bs_pad, jnp.uint8), jnp.int32(n),
        jnp.int32(0), jnp.int32(0), n_pad, bs_pad)
    m = n_pad + bs_pad
    sa, isa, hist, pack8, k_star, split_lv = MD._joint_sa(b, sp, m)
    ell0 = jnp.zeros(m, jnp.int32)
    pred, succ, a, bb = MD._neighbors(sa, ell0, jnp.int32(n), m)
    _, _, _, ref_sa, ref_isa = MD._assemble(
        sa, pred, succ, a, bb, jnp.int32(n), jnp.int32(0), m, n_pad, bs_pad)
    return np.asarray(ref_sa)[:n], np.asarray(ref_isa)[:n]

