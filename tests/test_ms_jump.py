"""Parity: the head-jumping scan (ops/ms_jump.py) vs the host spec
engine on identical inputs — head records must match EXACTLY (the merge
consumes nothing else), across chunk boundaries, separators, duplicate
documents, and divergence levels."""
from __future__ import annotations

import numpy as np
import pytest

from helpers import mutate, random_dna
from cmsbwt_tpu.engine import heads as heads_mod
from cmsbwt_tpu.engine.ms_host import ms_scan_collection
from cmsbwt_tpu.index.host import build_reference_index
from cmsbwt_tpu.io.fasta import SEPARATOR, augment_reference
from cmsbwt_tpu.ops.ms_jump import ms_jump_heads


def _collection(seed, ref_len, n_docs, snp, dup_pairs=0, doc_len=None):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, ref_len)
    docs = [np.frombuffer(mutate(rng, ref, snp), np.uint8)[:doc_len]
            for _ in range(n_docs)]
    for k in range(dup_pairs):
        if 2 * k + 1 < n_docs:
            docs[2 * k + 1] = docs[2 * k].copy()
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([dc, sep]) for dc in docs])
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    return x_aug, sx


def _host_heads(x_aug, sx):
    index = build_reference_index(x_aug)
    ms = ms_scan_collection(index, sx, np.nonzero(sx == SEPARATOR)[0])
    hh = heads_mod.extract_heads(index, ms, sx)
    return hh


@pytest.mark.parametrize("seed,ref_len,n_docs,snp,kw", [
    (0, 1500, 5, 0.02, {}),
    (1, 900, 4, 0.001, {}),            # low divergence (the target regime)
    (2, 1200, 6, 0.05, {"dup_pairs": 2}),
    (3, 400, 2, 0.0, {}),              # identical copies
    (4, 300, 20, 0.03, {"doc_len": 7}),  # separator-dense
    (5, 2000, 3, 0.01, {}),
])
@pytest.mark.parametrize("lanes", [3, 16])
def test_jump_heads_match_host(seed, ref_len, n_docs, snp, kw, lanes):
    x_aug, sx = _collection(seed, ref_len, n_docs, snp, **kw)
    hh = _host_heads(x_aug, sx)
    res = ms_jump_heads(x_aug, sx, lanes=lanes, window=16)
    assert res.h == hh.h, (res.h, hh.h)
    np.testing.assert_array_equal(np.asarray(res.head_t)[:res.h], hh.t)
    np.testing.assert_array_equal(np.asarray(res.head_pos)[:res.h], hh.pos)
    np.testing.assert_array_equal(np.asarray(res.head_len)[:res.h],
                                  hh.length)
    np.testing.assert_array_equal(np.asarray(res.head_smaller)[:res.h],
                                  hh.smaller)
    np.testing.assert_array_equal(np.asarray(res.head_char)[:res.h],
                                  hh.char)


def test_jump_to_device_merge_bytes(tmp_path):
    """jump scan -> device merge reproduces the host pipeline bytes."""
    from cmsbwt_tpu.engine.device_merge import merge_heads_device_resident
    from cmsbwt_tpu.engine import merge as merge_mod
    from cmsbwt_tpu.engine.pipeline import compute_bwt
    from cmsbwt_tpu.config import Config
    from helpers import make_inputs
    rng = np.random.default_rng(11)
    ref = random_dna(rng, 800)
    docs = [mutate(rng, ref, 0.005) for _ in range(4)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "h"),
                       backend="host"))
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate(
        [sep] + [np.concatenate([np.frombuffer(d, np.uint8), sep])
                 for d in docs])
    res = ms_jump_heads(x_aug, sx, lanes=4, window=16)
    d = int((sx == SEPARATOR).sum()) + 1   # the reference's D (Collection.d)
    rl, rc, _ = merge_heads_device_resident(res, d, rle_quirk=False,
                                            want_counter=False)
    assert merge_mod.runs_to_plain(rl, rc) == \
        (tmp_path / "h.bwt").read_bytes()


def test_pipeline_backend_jump(tmp_path):
    """compute_bwt(backend='jump') byte-matches the host backend, both
    formats, including the counter debug artifact."""
    from helpers import make_inputs
    from cmsbwt_tpu.config import Config
    from cmsbwt_tpu.engine.pipeline import compute_bwt
    rng = np.random.default_rng(5)
    ref = random_dna(rng, 700)
    docs = [mutate(rng, ref, 0.004) for _ in range(5)]
    docs[2] = docs[1]  # duplicate doc: counterBad path
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    for rle in (False, True):
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "h"),
                           backend="host", rle=rle))
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "j"),
                           backend="jump", rle=rle, lanes=8,
                           skip_window=16))
        ext = ".rl_bwt" if rle else ".bwt"
        assert (tmp_path / ("h" + ext)).read_bytes() == \
            (tmp_path / ("j" + ext)).read_bytes()
        art = "h.counterSmallerThanHead_true"
        assert (tmp_path / art).read_bytes() == \
            (tmp_path / "j.counterSmallerThanHead_true").read_bytes()


def test_pipeline_jump_host_merge_route(tmp_path):
    """backend='jump' with merge_backend='host' (the SARS-shape route):
    compacted heads download into the native host engine; bytes match."""
    from helpers import make_inputs
    from cmsbwt_tpu.config import Config
    from cmsbwt_tpu.engine.pipeline import compute_bwt
    rng = np.random.default_rng(17)
    ref = random_dna(rng, 600)
    docs = [mutate(rng, ref, 0.01) for _ in range(6)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    for rle in (False, True):
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "h"),
                           backend="host", rle=rle))
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "j"),
                           backend="jump", rle=rle, lanes=8, skip_window=16,
                           merge_backend="host"))
        ext = ".rl_bwt" if rle else ".bwt"
        assert (tmp_path / ("h" + ext)).read_bytes() == \
            (tmp_path / ("j" + ext)).read_bytes()
