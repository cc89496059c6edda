"""ops/pallas_scan.py: block-tree query helpers vs the sparse-table oracles
(index/device.py, ops/ms_jump.py), and the kernel in interpret mode vs the
jump backend's candidate chain. All on CPU (conftest forces the platform).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from cmsbwt_tpu.index.device import (build_lcp_sparse_table, nsv_device,
                                     psv_device)
from cmsbwt_tpu.ops.ms_jump import build_gmax_table, next_ge_device
from cmsbwt_tpu.ops import pallas_scan as PS


@pytest.fixture(scope="module")
def arrays():
    rng = np.random.default_rng(7)
    n = 1000
    lcp = rng.integers(-1, 40, n + 1).astype(np.int32)
    lcp[0] = 0
    lcp[n] = -1
    plcp = rng.integers(0, 40, n).astype(np.int32)
    return n, jnp.asarray(lcp), jnp.asarray(plcp)


def test_psv_nsv_row_match_sparse_table(arrays):
    n, lcp, plcp = arrays
    jump = build_lcp_sparse_table(lcp, n)
    agg, tree = PS.build_block_tree(lcp[:n], n, reduce_max=False)
    nb = agg.shape[1]
    levels = PS._levels_for(nb)
    lcp_row = jnp.zeros((1, nb * PS.BLOCK), jnp.int32)
    lcp_row = lcp_row.at[0, :n].set(lcp[:n])
    rng = np.random.default_rng(11)
    i = jnp.asarray(rng.integers(0, n, (1, 512)).astype(np.int32))
    ub = jnp.asarray(rng.integers(0, 42, (1, 512)).astype(np.int32))
    got_p = PS.psv_row(lcp_row, tree, nb, levels, i, ub, n)
    exp_p = psv_device(jump, i[0], ub[0], n).reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(exp_p))
    got_n = PS.nsv_row(lcp_row, tree, nb, levels, i, ub, n)
    exp_n = nsv_device(jump, i[0], ub[0], n).reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(exp_n))


def test_next_ge_row_matches_gmax(arrays):
    n, lcp, plcp = arrays
    gmax = build_gmax_table(plcp, n)
    g = jnp.arange(n, dtype=jnp.int32) + plcp[:n]
    agg, tree = PS.build_block_tree(g, n, reduce_max=True)
    nb = agg.shape[1]
    levels = PS._levels_for(nb)
    g_row = jnp.full((1, nb * PS.BLOCK), -(2**31 - 1), jnp.int32)
    g_row = g_row.at[0, :n].set(g)
    rng = np.random.default_rng(13)
    start = jnp.asarray(rng.integers(0, n + 2, (1, 512)).astype(np.int32))
    tv = jnp.asarray(rng.integers(0, n + 40, (1, 512)).astype(np.int32))
    got = PS.next_ge_row(g_row, tree, nb, levels, start, tv, n)
    exp = next_ge_device(gmax, start[0], tv[0], n).reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


def test_block_boundaries_psv():
    # adversarial: values < ub only exactly at block boundaries
    n = PS.BLOCK * 5 + 3
    lcp = np.full(n, 50, np.int32)
    for b in (PS.BLOCK, 3 * PS.BLOCK - 1, 4 * PS.BLOCK):
        lcp[b] = 1
    lcpj = jnp.asarray(np.concatenate([lcp, [-1]]).astype(np.int32))
    jump = build_lcp_sparse_table(lcpj, n)
    agg, tree = PS.build_block_tree(jnp.asarray(lcp), n, reduce_max=False)
    nb = agg.shape[1]
    levels = PS._levels_for(nb)
    lcp_row = jnp.zeros((1, nb * PS.BLOCK), jnp.int32)
    lcp_row = lcp_row.at[0, :n].set(jnp.asarray(lcp))
    i = jnp.asarray(np.arange(n, dtype=np.int32).reshape(1, -1))
    ub = jnp.full((1, n), 2, jnp.int32)
    got = PS.psv_row(lcp_row, tree, nb, levels, i, ub, n)
    exp = psv_device(jump, i[0], ub[0], n).reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))
    got_n = PS.nsv_row(lcp_row, tree, nb, levels, i, ub, n)
    exp_n = nsv_device(jump, i[0], ub[0], n).reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(got_n), np.asarray(exp_n))


@pytest.mark.parametrize("seed,ref_len,n_docs,snp,lanes", [
    (0, 1500, 5, 0.02, 16),
    (1, 900, 4, 0.001, 3),
    (3, 400, 2, 0.0, 5),
    (4, 300, 20, 0.03, 8),     # separator-dense
])
def test_pallas_heads_match_host_interpret(seed, ref_len, n_docs, snp,
                                           lanes):
    """Kernel in interpret mode vs the host spec engine: head records
    must match exactly (same assertion set as test_ms_jump)."""
    from cmsbwt_tpu.engine import heads as heads_mod
    from cmsbwt_tpu.engine.ms_host import ms_scan_collection
    from cmsbwt_tpu.index.host import build_reference_index
    from cmsbwt_tpu.io.fasta import SEPARATOR, augment_reference
    from cmsbwt_tpu.ops.pallas_scan import ms_pallas_heads
    from helpers import mutate, random_dna
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, ref_len)
    docs = [np.frombuffer(mutate(rng, ref, snp), np.uint8)
            for _ in range(n_docs)]
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([d, sep]) for d in docs])
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    index = build_reference_index(x_aug)
    ms = ms_scan_collection(index, sx, np.nonzero(sx == SEPARATOR)[0])
    hh = heads_mod.extract_heads(index, ms, sx)
    res = ms_pallas_heads(x_aug, sx, lanes=lanes, window=16, iters=32,
                          interpret=True)
    assert res.h == hh.h, (res.h, hh.h)
    np.testing.assert_array_equal(np.asarray(res.head_t)[:res.h], hh.t)
    np.testing.assert_array_equal(np.asarray(res.head_pos)[:res.h], hh.pos)
    np.testing.assert_array_equal(np.asarray(res.head_len)[:res.h],
                                  hh.length)
    np.testing.assert_array_equal(np.asarray(res.head_smaller)[:res.h],
                                  hh.smaller)
    np.testing.assert_array_equal(np.asarray(res.head_char)[:res.h],
                                  hh.char)


def test_pipeline_backend_pallas(tmp_path):
    """compute_bwt(backend='pallas') byte-matches the host backend, both
    formats, incl. the counter debug artifact (interpret mode on CPU)."""
    from helpers import make_inputs, mutate, random_dna
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
        compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "p"),
                           backend="pallas", rle=rle, lanes=8,
                           skip_window=16))
        ext = ".rl_bwt" if rle else ".bwt"
        assert (tmp_path / ("h" + ext)).read_bytes() == \
            (tmp_path / ("p" + ext)).read_bytes()
        art = "h.counterSmallerThanHead_true"
        assert (tmp_path / art).read_bytes() == \
            (tmp_path / "p.counterSmallerThanHead_true").read_bytes()


def test_pallas_segmented_matches_host():
    """Tiny segments + tiny context force the segment loop and the
    context-violation retry; heads must still match the host engine."""
    from cmsbwt_tpu.engine import heads as heads_mod
    from cmsbwt_tpu.engine.ms_host import ms_scan_collection
    from cmsbwt_tpu.index.host import build_reference_index
    from cmsbwt_tpu.io.fasta import SEPARATOR, augment_reference
    from cmsbwt_tpu.ops.pallas_scan import ms_pallas_heads
    from helpers import mutate, random_dna
    rng = np.random.default_rng(9)
    ref = random_dna(rng, 1200)
    docs = [np.frombuffer(mutate(rng, ref, 0.005), np.uint8)
            for _ in range(4)]
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([d, sep]) for d in docs])
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    index = build_reference_index(x_aug)
    ms = ms_scan_collection(index, sx, np.nonzero(sx == SEPARATOR)[0])
    hh = heads_mod.extract_heads(index, ms, sx)
    # segment=1024 chars (mult of 512 after rounding), ctx=512 -> factors
    # at 0.5% SNP are ~200 chars so retries stay rare but segmentation is
    # heavily exercised (5 segments)
    res = ms_pallas_heads(x_aug, sx, lanes=4, window=16, iters=32,
                          segment_chars=1024, ctx_chars=512,
                          interpret=True)
    assert res.h == hh.h, (res.h, hh.h)
    np.testing.assert_array_equal(np.asarray(res.head_t)[:res.h], hh.t)
    np.testing.assert_array_equal(np.asarray(res.head_pos)[:res.h], hh.pos)
    np.testing.assert_array_equal(np.asarray(res.head_len)[:res.h],
                                  hh.length)
    np.testing.assert_array_equal(np.asarray(res.head_smaller)[:res.h],
                                  hh.smaller)


def test_pallas_segmented_viol_retry():
    """Identical documents: every factor runs to the doc end, so any
    mid-collection segment boundary forces the ctx-violation retry path
    (ctx quadruples until the slice reaches the collection end)."""
    from cmsbwt_tpu.engine import heads as heads_mod
    from cmsbwt_tpu.engine.ms_host import ms_scan_collection
    from cmsbwt_tpu.index.host import build_reference_index
    from cmsbwt_tpu.io.fasta import SEPARATOR, augment_reference
    from cmsbwt_tpu.ops.pallas_scan import ms_pallas_heads
    from helpers import random_dna
    rng = np.random.default_rng(10)
    ref = random_dna(rng, 900)
    doc = np.frombuffer(ref, np.uint8)
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([doc, sep])
                                 for _ in range(3)])
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    index = build_reference_index(x_aug)
    ms = ms_scan_collection(index, sx, np.nonzero(sx == SEPARATOR)[0])
    hh = heads_mod.extract_heads(index, ms, sx)
    res = ms_pallas_heads(x_aug, sx, lanes=3, window=16, iters=32,
                          segment_chars=512, ctx_chars=512,
                          interpret=True)
    assert res.h == hh.h, (res.h, hh.h)
    np.testing.assert_array_equal(np.asarray(res.head_t)[:res.h], hh.t)
    np.testing.assert_array_equal(np.asarray(res.head_pos)[:res.h], hh.pos)
    np.testing.assert_array_equal(np.asarray(res.head_len)[:res.h],
                                  hh.length)


@pytest.mark.parametrize("docs_spec", [
    [b""],                      # single empty document
    [b"A"],                     # single char
    [b"", b"ACG", b""],         # empty docs between real ones
])
def test_pallas_tiny_collections(docs_spec):
    from cmsbwt_tpu.engine import heads as heads_mod
    from cmsbwt_tpu.engine.ms_host import ms_scan_collection
    from cmsbwt_tpu.index.host import build_reference_index
    from cmsbwt_tpu.io.fasta import SEPARATOR, augment_reference
    from cmsbwt_tpu.ops.pallas_scan import ms_pallas_heads
    ref = b"ACGTACGTAC"
    docs = [np.frombuffer(d, np.uint8) for d in docs_spec]
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([d, sep]) for d in docs])
    x_aug = np.frombuffer(augment_reference(ref), np.uint8)
    index = build_reference_index(x_aug)
    ms = ms_scan_collection(index, sx, np.nonzero(sx == SEPARATOR)[0])
    hh = heads_mod.extract_heads(index, ms, sx)
    res = ms_pallas_heads(x_aug, sx, lanes=2, window=16, iters=8,
                          interpret=True)
    assert res.h == hh.h
    np.testing.assert_array_equal(np.asarray(res.head_t)[:res.h], hh.t)
    np.testing.assert_array_equal(np.asarray(res.head_pos)[:res.h], hh.pos)
    np.testing.assert_array_equal(np.asarray(res.head_len)[:res.h],
                                  hh.length)
