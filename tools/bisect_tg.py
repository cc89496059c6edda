"""Offline bisection of tail_good_dev with captured real inputs."""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp

import cmsbwt_tpu.engine.device_merge as dm

d = np.load("/tmp/tg_capture.npz")
h_pad = int(d["h_pad"])
p_pad = int(d["p_pad"])
cls = {k[4:]: jax.device_put(d[k]) for k in d.files if k.startswith("cls_")}
pairs = {k[6:]: jax.device_put(d[k]) for k in d.files
         if k.startswith("pairs_")}
slot_base = jax.device_put(d["slot_base"])
h = jax.device_put(d["h"])
n = jax.device_put(d["n"])
print("h_pad", h_pad, "p_pad", p_pad, "n_classes", int(d["cls_n_classes"]),
      "total", int(d["pairs_total"]))


def sync(t):
    for x in jax.tree_util.tree_leaves(t):
        np.asarray(x[:1] if getattr(x, "ndim", 0) else x)


def timeit(name, f, reps=3):
    out = f()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f()
        sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")
    return out


timeit("tail_good_dev FULL",
       lambda: dm.tail_good_dev(cls, pairs, slot_base, h, n, h_pad, p_pad))

# --- chopped variants ---
INT_MAX = dm.INT_MAX
I64_BIG = dm.I64_BIG


@functools.partial(jax.jit, static_argnames=("h_pad", "p_pad", "upto"))
def tg_part(cls, pairs, slot_base, h, n, h_pad: int, p_pad: int,
            upto: str = "expand"):
    cidx = jnp.arange(h_pad, dtype=jnp.int32)
    cvalid = cidx < cls["n_classes"]
    cnt = pairs["pair_cnt"]
    off = jnp.cumsum(cnt) - cnt
    pidx = jnp.arange(p_pad, dtype=jnp.int32)
    total = pairs["total"].astype(jnp.int32)
    pvalid = pidx < total
    starts = jnp.zeros(p_pad, jnp.int32).at[
        jnp.where(cvalid & (cnt > 0), off, p_pad)].max(
        cidx + 1, mode="drop")
    src_cls = jax.lax.cummax(starts) - 1
    src_cls = jnp.clip(src_cls, 0, h_pad - 1)

    def seg_fill(payload):
        with jax.enable_x64(True):
            packed = ((off.astype(jnp.int64) + 1) << 33) | \
                payload.astype(jnp.int64)
            at = jnp.where(cvalid & (cnt > 0), off, p_pad)
            base = jnp.full(p_pad, -1, jnp.int64).at[at].max(
                packed, mode="drop")
            return jax.lax.cummax(base) & ((jnp.int64(1) << 33) - 1)

    delta1 = seg_fill(pairs["pair_lo"] - off + p_pad)
    b_idx = (pidx + delta1 - p_pad).astype(jnp.int32)
    b = pairs["bucket_pos"][jnp.clip(b_idx, 0, h_pad - 1)]
    s1s = seg_fill(((cls["length"].astype(jnp.int64)
                     + cls["pos"].astype(jnp.int64)) << 1)
                   | cls["smaller"].astype(jnp.int64))
    q_len = ((s1s >> 1) - b.astype(jnp.int64)).astype(jnp.int32)
    q_small = (s1s & 1) != 0
    q_isa = seg_fill(cls["isa_next"]).astype(jnp.int32)
    q_size = seg_fill(cls["size"]).astype(jnp.int32)
    q_k = jnp.where(q_small, q_len, 2 * n - q_len)
    if upto == "expand":
        return b, q_k, q_isa, q_size, src_cls
    with jax.enable_x64(True):
        scale = (n + 1).astype(jnp.int64)
        t_k2 = jnp.where(cvalid,
                         cls["key_k"].astype(jnp.int64) * scale
                         + cls["isa_next"].astype(jnp.int64), I64_BIG)
        q_k2 = jnp.where(pvalid,
                         q_k.astype(jnp.int64) * scale
                         + q_isa.astype(jnp.int64), I64_BIG)
        key1 = jnp.concatenate([jnp.where(cvalid, cls["pos"], INT_MAX),
                                jnp.where(pvalid, b, INT_MAX)])
        key2f = jnp.concatenate(
            [jnp.where(cvalid, (t_k2 << 1) | 1, I64_BIG),
             jnp.where(pvalid, q_k2 << 1, I64_BIG)])
        srcidx = jnp.concatenate([cidx, pidx])
        pay = jnp.concatenate([slot_base[:h_pad], q_size])
        k1s, k2fs, i_s, pay_s = jax.lax.sort(
            (key1, key2f, srcidx, pay), num_keys=2)
    if upto == "sort":
        return k1s, k2fs, i_s, pay_s
    f_s = (k2fs & 1).astype(jnp.int32)
    k2s = k2fs >> 1
    slot_s = size_s = pay_s
    jn_pad = h_pad + p_pad
    rowsi = jnp.arange(jn_pad, dtype=jnp.int32)
    with jax.enable_x64(True):
        rows = rowsi.astype(jnp.int64)
        FILL_BIG = jnp.int64((1 << 62) - 1)
        LOW31 = (jnp.int64(1) << 31) - 1

        def rev_fill(payload31):
            packed = jnp.where(f_s == 1, (rows << 31)
                               | payload31.astype(jnp.int64), FILL_BIG)
            return jax.lax.cummin(packed[::-1])[::-1]

        fp = rev_fill(k1s)
        f_pos = (fp & LOW31).astype(jnp.int32)
        t_row = (fp >> 31).astype(jnp.int32)
        f_cls = (rev_fill(i_s) & LOW31).astype(jnp.int32)
        change_next = jnp.concatenate(
            [(k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1]),
             jnp.ones(1, dtype=bool)])
    run_end = dm._rev_fill_min(
        jnp.where(change_next, rowsi, jnp.int32(jn_pad)))
    if upto == "fills":
        return f_pos, t_row, f_cls, run_end
    is_q = f_s == 0
    in_range_s = is_q & (f_pos == k1s) & (k1s < INT_MAX)
    exact_s = in_range_s & (t_row <= run_end)
    good_s = in_range_s & ~exact_s
    with jax.enable_x64(True):
        gcum = jnp.cumsum(jnp.where(good_s, size_s, 0).astype(jnp.int64))
        gexc = gcum - jnp.where(good_s, size_s, 0)
        prev_t = jnp.concatenate(
            [jnp.full(1, -1, jnp.int64),
             jax.lax.cummax(jnp.where(f_s == 1, rows,
                                      jnp.int64(-1)))[:-1]])
        pt = jnp.clip(prev_t, 0, jn_pad - 1).astype(jnp.int32)
        base_cum = jnp.where(prev_t >= 0, gcum[pt], 0)
        credit = (gcum - base_cum).astype(jnp.int32)
    is_t = f_s == 1
    counter = jnp.zeros(h_pad + 2, jnp.int32).at[
        jnp.where(is_t, slot_s, h_pad + 1)].add(
        jnp.where(is_t, credit, 0), mode="drop")
    n_exact = jnp.sum(exact_s.astype(jnp.int32)).astype(jnp.int32)
    with jax.enable_x64(True):
        exact_members = jnp.sum(jnp.where(exact_s, size_s, 0)
                                .astype(jnp.int64))
    if upto == "credit":
        return counter, n_exact, exact_members
    ekey = jnp.where(exact_s, i_s, INT_MAX)
    _, e_pidx, e_fnd = jax.lax.sort((ekey, i_s, f_cls), num_keys=1)
    return (counter, n_exact, exact_members, e_pidx[:p_pad],
            e_fnd[:p_pad], src_cls)


for upto in ("expand", "sort", "fills", "credit", "all"):
    timeit(f"upto={upto}",
           lambda u=upto: tg_part(cls, pairs, slot_base, h, n,
                                  h_pad, p_pad, u))
