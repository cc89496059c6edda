"""Capture real tail_good_dev / runs_emit_dev inputs from a primary-shaped
run into /tmp/tg_capture.npz for offline kernel bisection."""
import sys
import numpy as np

import cmsbwt_tpu.engine.device_merge as dm

orig_tg = dm.tail_good_dev
orig_re = dm.runs_emit_dev
cap = {}


def tg_spy(cls, pairs, slot_base, h, n, h_pad, p_pad):
    for k, v in cls.items():
        cap[f"cls_{k}"] = np.asarray(v)
    for k, v in pairs.items():
        cap[f"pairs_{k}"] = np.asarray(v)
    cap["slot_base"] = np.asarray(slot_base)
    cap["h"] = np.asarray(h)
    cap["n"] = np.asarray(n)
    cap["h_pad"] = h_pad
    cap["p_pad"] = p_pad
    return orig_tg(cls, pairs, slot_base, h, n, h_pad, p_pad)


def re_spy(cls, sa_ord, slot_base, counter, tails_cnt, bwt_heads,
           ref_sa, ref_isa, ref_bwt, d, n, h_pad, n_pad, rle_quirk):
    cap["re_sa_ord"] = np.asarray(sa_ord)
    cap["re_counter"] = np.asarray(counter)
    cap["re_tails_cnt"] = np.asarray(tails_cnt)
    cap["re_bwt_heads"] = np.asarray(bwt_heads)
    cap["re_ref_sa"] = np.asarray(ref_sa)
    cap["re_ref_isa"] = np.asarray(ref_isa)
    cap["re_ref_bwt"] = np.asarray(ref_bwt)
    cap["re_d"] = np.asarray(d)
    cap["re_n_pad"] = n_pad
    cap["re_rle_quirk"] = rle_quirk
    return orig_re(cls, sa_ord, slot_base, counter, tails_cnt, bwt_heads,
                   ref_sa, ref_isa, ref_bwt, d, n, h_pad, n_pad, rle_quirk)


dm.tail_good_dev = tg_spy
dm.runs_emit_dev = re_spy

import pathlib
import tempfile

sys.path.insert(0, "/root/repo")
from bench import make_workload  # noqa: E402
from cmsbwt_tpu.config import Config  # noqa: E402
from cmsbwt_tpu.engine.pipeline import compute_bwt  # noqa: E402

tmp = pathlib.Path(tempfile.mkdtemp(prefix="tgcap_"))
lst = make_workload(tmp, 2.0, 10, 0.01)
cfg = Config(filename=str(lst), outname=str(tmp / "ours"),
             backend="dense", merge_backend="device")
compute_bwt(cfg)
np.savez("/tmp/tg_capture.npz", **cap)
print("saved", {k: getattr(v, "shape", v) for k, v in list(cap.items())[:8]})
