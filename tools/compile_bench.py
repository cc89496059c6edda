"""Per-program XLA compile-time harness (axon tunnel).

Compiles each hot pipeline program SOLO with primary-config-like shapes
into a throwaway cache dir and reports wall seconds, several in parallel.
Usage:
    python tools/compile_bench.py [prog ...]    # default: all
Shapes mirror the 20 Mchar primary config (h ~ 1.4M heads).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["CMSBWT_JAX_CACHE"] = os.environ.get(
    "CB_CACHE", "/tmp/compile_bench_cache")

import jax
import jax.numpy as jnp

from cmsbwt_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

# primary-ish shapes (bumped by CB_BUMP to force fresh programs per run)
BUMP = int(os.environ.get("CB_BUMP", "0"))
N_PAD = 2_090_473 + BUMP
SN_PAD = 21_035_758 + BUMP
M = N_PAD + SN_PAD
H_PAD = 1_422_739 + BUMP
P_PAD = 2_097_152 + BUMP
E_PAD = 262_144 + BUMP
EM_PAD = 8_353_586 + BUMP
RHO_PAD = 4_194_304 + BUMP
HIST = 17

S = jax.ShapeDtypeStruct
i32, i64, u8, b1 = jnp.int32, jnp.int64, jnp.uint8, jnp.bool_
sc = S((), i32)


def cls_avals(with_slot):
    from cmsbwt_tpu.engine.device_merge import _cls_avals
    return _cls_avals(H_PAD, with_slot)


def pairs_avals():
    from cmsbwt_tpu.engine.device_merge import _pairs_avals
    return _pairs_avals(H_PAD)


def build_specs():
    from cmsbwt_tpu.engine import device_merge as dm
    from cmsbwt_tpu.ops import ms_dense as md
    from cmsbwt_tpu.ops.joint_sa import joint_suffix_array
    im = S((M,), i32)
    ih = S((H_PAD,), i32)
    ihb = S((H_PAD,), b1)
    inn = S((N_PAD,), i32)
    isn = S((SN_PAD,), i32)
    ir = S((RHO_PAD,), i32)
    return {
        "joint_sa": (joint_suffix_array, (S((M,), u8), im), {"m": M}, False),
        "irreducible": (md._irreducible_slots,
                        (S((M,), u8), im, im, im, im, sc, sc),
                        {"m": M, "n_pad": N_PAD}, False),
        "lift_fill": (md._lift_bytes_fill, (ir, ir, ir, S((M,), i64), im),
                      {"m": M, "rho_pad": RHO_PAD}, True),
        "neighbors": (md._neighbors, (im, im, sc), {"m": M}, False),
        "assemble": (md._assemble, (im, im, im, im, im, sc, sc),
                     {"m": M, "n_pad": N_PAD, "sn_pad": SN_PAD}, False),
        "postprocess": (md._postprocess,
                        (S((M,), u8), isn, isn, S((SN_PAD,), b1), sc, sc),
                        {"n_pad": N_PAD, "sn_pad": SN_PAD}, False),
        "compact": (md._compact_heads_raw,
                    (isn, isn, S((SN_PAD,), b1), S((SN_PAD,), b1),
                     S((SN_PAD,), u8)),
                    {"sn_pad": SN_PAD, "h_pad": H_PAD}, False),
        "fixup": (dm.fixup_dev, (ih, ih, ih, sc, inn), {"h_pad": H_PAD},
                  False),
        "tail_counts": (dm.tail_counts_dev, (ih, ih, sc),
                        {"h_pad": H_PAD, "n_pad": N_PAD}, False),
        "group": (dm.group_dev, (ih, ih, ihb, ih, ih, sc, sc),
                  {"h_pad": H_PAD}, False),
        "class_ranks": (dm.class_ranks_dev, (cls_avals(False), inn,
                                             sc, sc, sc),
                        {"h_pad": H_PAD}, False),
        "head_sa": (dm.head_string_sa_dev, (S((H_PAD + 1,), i32), sc),
                    {"h_pad": H_PAD}, False),
        "rank_heads": (dm.rank_heads_dev,
                       (cls_avals(True), S((H_PAD + 1,), i32),
                        S((H_PAD,), u8), ih, sc), {"h_pad": H_PAD}, False),
        "tail_pairs": (dm.tail_pairs_count_dev, (cls_avals(True),),
                       {"h_pad": H_PAD}, False),
        "tail_good": (dm.tail_good_dev,
                      (cls_avals(True), pairs_avals(), ih, sc, sc),
                      {"h_pad": H_PAD, "p_pad": P_PAD}, False),
        "tail_exact": (dm.tail_exact_dev,
                       (S((H_PAD + 2,), i32), cls_avals(True), pairs_avals(),
                        ih, ih, ih, S((P_PAD,), i32), S((P_PAD,), i32),
                        S((P_PAD,), i32), sc, sc),
                       {"h_pad": H_PAD, "e_pad": E_PAD, "em_pad": EM_PAD},
                       False),
        "runs_emit": (dm.runs_emit_dev,
                      (cls_avals(True), ih, ih, S((H_PAD + 2,), i32), inn,
                       S((H_PAD,), u8), inn, inn, S((N_PAD,), u8), sc, sc),
                      {"h_pad": H_PAD, "n_pad": N_PAD, "rle_quirk": False},
                      False),
    }


def main():
    specs = build_specs()
    names = sys.argv[1:] or list(specs)
    import threading
    results = {}

    def work(name):
        fn, avals, statics, x64 = specs[name]
        t0 = time.time()
        try:
            if x64:
                with jax.enable_x64(True):
                    fn.lower(*avals, **statics).compile()
            else:
                fn.lower(*avals, **statics).compile()
            results[name] = time.time() - t0
        except Exception as e:
            results[name] = f"FAIL {type(e).__name__}: {str(e)[:100]}"

    par = int(os.environ.get("CB_PAR", "6"))
    pending = list(names)
    while pending:
        batch, pending = pending[:par], pending[par:]
        ts = [threading.Thread(target=work, args=(n,)) for n in batch]
        [t.start() for t in ts]
        [t.join() for t in ts]
    for n in names:
        r = results.get(n)
        print(f"{n}: {r if isinstance(r, str) else '%.1fs' % r}", flush=True)


if __name__ == "__main__":
    main()
