"""Parity: device-side downstream merge (engine/device_merge.py) vs the
host engine (heads/ranking/tails/merge) on identical head records.

Covers both output modes (plain residuals and the reference RLE writer's
per-class phantom residual quirk), duplicate documents (the counterBad
exact-key path, ref CMS-BWT-functions.cpp:1567-1589), and single-doc
collections.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_dna, mutate
from cmsbwt_tpu.io.fasta import augment_reference, SEPARATOR
from cmsbwt_tpu.index.host import build_reference_index
from cmsbwt_tpu.engine.ms_host import ms_scan_collection
from cmsbwt_tpu.engine import heads as heads_mod
from cmsbwt_tpu.engine import ranking as ranking_mod
from cmsbwt_tpu.engine import tails as tails_mod
from cmsbwt_tpu.engine import merge as merge_mod
from cmsbwt_tpu.engine.device_merge import merge_device


def _pow2(x: int) -> int:
    return 1 << max(4, int(np.ceil(np.log2(max(x, 1)))))


def _pad(a, size, dt, fill=0):
    out = np.full(size, fill, dt)
    out[: len(a)] = a
    return jnp.asarray(out)


def _host_runs(index, sx, rle_quirk):
    ms = ms_scan_collection(index, sx, np.nonzero(sx == SEPARATOR)[0])
    heads_h = heads_mod.extract_heads(index, ms, sx)
    heads_mod.fixup_heads(index, heads_h)
    n = index.n
    hn = heads_h.to_next > 0
    hp = heads_h.pos[hn] + 1
    diff = np.bincount(hp, minlength=n + 1)[: n + 1].astype(np.int64)
    diff -= np.bincount(hp + heads_h.to_next[hn], minlength=n + 1)[: n + 1]
    tails_cnt = np.cumsum(diff[:-1])
    classes = heads_mod.build_classes(index, heads_h)
    d = int((sx == SEPARATOR).sum())
    ranked = ranking_mod.rank_heads(index, classes, heads_h, d)
    counter = tails_mod.position_tails(index, classes, ranked)
    run_len, run_char = merge_mod.build_runs(
        index, classes, ranked, counter, tails_cnt, d, rle_quirk)
    return heads_h, d, run_len, run_char, counter


def _device_runs(index, heads_h, sn, d, rle_quirk):
    h = heads_h.h
    n = index.n
    h_pad = _pow2(h + 1)
    n_pad = _pow2(n + 1)
    return merge_device(
        _pad(heads_h.t, h_pad, np.int32),
        _pad(heads_h.pos, h_pad, np.int32),
        _pad(heads_h.length, h_pad, np.int32),
        _pad(heads_h.smaller, h_pad, bool),
        _pad(heads_h.char, h_pad, np.uint8),
        _pad(index.sa, n_pad, np.int32),
        _pad(index.isa, n_pad, np.int32),
        _pad(index.bwt, n_pad, np.uint8),
        h, n, sn, d, rle_quirk)


def _collection(seed, ref_len, n_docs, snp, dup_pairs=0):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, ref_len)
    docs = [np.frombuffer(mutate(rng, ref, snp), np.uint8)
            for _ in range(n_docs)]
    for k in range(dup_pairs):
        if 2 * k + 1 < n_docs:
            docs[2 * k + 1] = docs[2 * k].copy()
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([dc, sep]) for dc in docs])
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    return x_aug, sx


@pytest.mark.parametrize("rle_quirk", [False, True])
@pytest.mark.parametrize("seed,ref_len,n_docs,snp,dups", [
    (0, 1500, 6, 0.02, 2),   # duplicate docs: exercises counterBad merges
    (1, 800, 4, 0.05, 0),
    (2, 2000, 8, 0.01, 1),
    (3, 300, 1, 0.03, 0),    # single document
])
def test_device_merge_matches_host(seed, ref_len, n_docs, snp, dups,
                                   rle_quirk):
    x_aug, sx = _collection(seed, ref_len, n_docs, snp, dups)
    index = build_reference_index(x_aug)
    heads_h, d, run_len_h, run_char_h, counter_h = _host_runs(
        index, sx, rle_quirk)
    run_len_d, run_char_d, counter_d = _device_runs(
        index, heads_h, len(sx), d, rle_quirk)
    np.testing.assert_array_equal(counter_d, counter_h)
    # the device merge drops zero-length runs and merges adjacent
    # equal-char runs on device (both writers normalize the same way) —
    # compare against the host list normalized identically
    rl_h = np.asarray(run_len_h)
    rc_h = np.asarray(run_char_h)
    keep = rl_h > 0
    rl_h, rc_h = rl_h[keep], rc_h[keep]
    new = np.ones(len(rc_h), dtype=bool)
    new[1:] = rc_h[1:] != rc_h[:-1]
    gid = np.cumsum(new) - 1
    merged_len = np.zeros(int(gid[-1]) + 1 if len(gid) else 0, np.int64)
    np.add.at(merged_len, gid, rl_h)
    np.testing.assert_array_equal(run_len_d, merged_len)
    np.testing.assert_array_equal(run_char_d, rc_h[new])
    # and the rendered bytes agree end-to-end
    assert merge_mod.runs_to_plain(run_len_d, run_char_d) == \
        merge_mod.runs_to_plain(run_len_h, run_char_h)
    assert merge_mod.runs_to_rle(run_len_d, run_char_d) == \
        merge_mod.runs_to_rle(run_len_h, run_char_h)


def test_pipeline_merge_backend_device(tmp_path):
    """compute_bwt with merge_backend=device byte-matches the host merge,
    both formats, including the debug counter artifact."""
    from helpers import make_inputs
    rng = np.random.default_rng(7)
    ref = random_dna(rng, 600)
    docs = [mutate(rng, ref, 0.02) for _ in range(5)]
    docs[1] = docs[0]  # duplicate doc: counterBad path
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    from cmsbwt_tpu.config import Config
    from cmsbwt_tpu.engine.pipeline import compute_bwt
    for rle in (False, True):
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "h"),
                           backend="dense", merge_backend="host", rle=rle))
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "d"),
                           backend="dense", merge_backend="device", rle=rle))
        ext = ".rl_bwt" if rle else ".bwt"
        assert (tmp_path / ("h" + ext)).read_bytes() == \
            (tmp_path / ("d" + ext)).read_bytes()
        art = "h.counterSmallerThanHead_true"
        assert (tmp_path / art).read_bytes() == \
            (tmp_path / "d.counterSmallerThanHead_true").read_bytes()
