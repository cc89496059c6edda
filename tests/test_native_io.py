"""Native C++ IO runtime vs the numpy implementations."""
import numpy as np
import pytest

from cmsbwt_tpu.io import fasta, native
from cmsbwt_tpu.engine.merge import runs_to_plain, runs_to_rle

from helpers import make_fasta, mutate, random_dna


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


def test_native_parse_matches_python(tmp_path, lib):
    cases = [
        b">a\nACGT\n>b\nGGTT\n",
        b"ACGT\nGGTT\n",
        b"AC\n\nGT\n",
        b">a\nACGT\nGGG",           # unterminated final line dropped
        b">x\n" + b"A" * 200 + b"\n",
    ]
    for data in cases:
        p = tmp_path / "c.fa"
        p.write_bytes(data)
        a = fasta.parse_collection(str(p), 1 << 60, use_native=True)
        b = fasta.parse_collection(str(p), 1 << 60, use_native=False)
        assert bytes(a.sx) == bytes(b.sx), data
        assert a.n_separators == b.n_separators
        np.testing.assert_array_equal(a.sep_positions, b.sep_positions)
        np.testing.assert_array_equal(a.doc_starts, b.doc_starts)


def test_native_parse_prefix_cut(tmp_path, lib):
    p = tmp_path / "c.fa"
    p.write_bytes(b">a\nAAAA\nCCCC\nGGGG\n")
    for lim in (8, 6, 300):
        a = fasta.parse_collection(str(p), lim, use_native=True)
        b = fasta.parse_collection(str(p), lim, use_native=False)
        assert bytes(a.sx) == bytes(b.sx), lim


def test_native_writers_match(tmp_path, lib):
    rng = np.random.default_rng(0)
    run_len = rng.integers(0, 9, 500).astype(np.int64)
    run_char = rng.integers(60, 70, 500).astype(np.uint8)
    pp = tmp_path / "o.bwt"
    assert native.write_plain_native(str(pp), run_len, run_char)
    assert pp.read_bytes() == runs_to_plain(run_len[run_len > 0],
                                            run_char[run_len > 0])
    pr = tmp_path / "o.rl_bwt"
    assert native.write_rle_native(str(pr), run_len, run_char)
    keep = run_len > 0
    assert pr.read_bytes() == runs_to_rle(run_len[keep], run_char[keep])


def test_searchsorted_right_native_matches_numpy():
    from cmsbwt_tpu.io.native import searchsorted_right_native
    rng = np.random.default_rng(11)
    a = np.sort(rng.integers(0, 1000, 5000)).astype(np.int64)
    q = rng.integers(-5, 1005, 3000).astype(np.int64)
    got = searchsorted_right_native(a, q, size_threshold=1)
    np.testing.assert_array_equal(got, np.searchsorted(a, q, side="right"))
    # edge: empty haystack -> all zeros
    got0 = searchsorted_right_native(np.zeros(0, np.int64), q,
                                     size_threshold=1)
    assert (got0 == 0).all()


def test_lexsort2_native_matches_lexsort():
    from cmsbwt_tpu.io.native import lexsort2_native
    rng = np.random.default_rng(12)
    p = rng.integers(0, 50, 4000).astype(np.int64)
    s = rng.integers(0, 50, 4000).astype(np.int64)
    got = lexsort2_native(p, s, size_threshold=1)
    np.testing.assert_array_equal(got, np.lexsort((s, p)))


def test_expand_slots_native_matches_numpy():
    from cmsbwt_tpu.io.native import expand_slots_native
    if expand_slots_native(np.ones(1, np.int64), np.zeros(1, np.int64),
                           np.zeros(1, np.int64), np.zeros(1, np.int64),
                           np.zeros(1, np.int64), np.zeros(1, np.uint8),
                           np.zeros(1, np.uint8), np.zeros(2, np.int64),
                           np.zeros(2, np.uint8)) is None:
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(13)
    nec = 200
    m_c = rng.integers(1, 6, nec).astype(np.int64)
    tot = int(m_c.sum())
    ex_mc = np.concatenate([[0], np.cumsum(m_c)[:-1]])
    base_c = ex_mc.copy()  # text layout == emission layout for this test
    cls_start = 3 * ex_mc + np.arange(nec)  # disjoint, stride-2 fits
    counter = rng.integers(0, 9, tot).astype(np.int64)
    cls_char = rng.integers(3, 128, nec).astype(np.uint8)
    bwt_heads = rng.integers(3, 128, tot).astype(np.uint8)
    size = int(cls_start.max() + 2 * m_c[-1] + 2)
    rl_n = np.zeros(size, np.int64); rc_n = np.zeros(size, np.uint8)
    csum = expand_slots_native(m_c, ex_mc, base_c, cls_start, counter,
                               cls_char, bwt_heads, rl_n, rc_n)
    # numpy reference formulation
    cls_of_slot = np.repeat(np.arange(nec), m_c)
    within = np.arange(tot) - np.repeat(ex_mc, m_c)
    ridx = cls_start[cls_of_slot] + 2 * within
    rl = np.zeros(size, np.int64); rc = np.zeros(size, np.uint8)
    rl[ridx] = counter[base_c[cls_of_slot] + within]
    rc[ridx] = cls_char[cls_of_slot]
    rl[ridx + 1] = 1
    rc[ridx + 1] = bwt_heads
    np.testing.assert_array_equal(rl_n, rl)
    np.testing.assert_array_equal(rc_n, rc)
    np.testing.assert_array_equal(
        csum, np.bincount(cls_of_slot, weights=counter, minlength=nec))


def test_fill_class_ranks_native_matches_numpy():
    from cmsbwt_tpu.io.native import fill_class_ranks_native
    rng = np.random.default_rng(14)
    nec = 150
    sizes = rng.integers(1, 5, nec).astype(np.int64)
    off = np.concatenate([[0], np.cumsum(sizes)])
    h = int(off[-1])
    member_head = rng.permutation(h).astype(np.int64)
    rank_value = rng.integers(0, 10**6, nec).astype(np.int64)
    pseudo = 7
    out = np.zeros(h + 1, np.int64)
    if not fill_class_ranks_native(off, member_head, rank_value, pseudo, out):
        import pytest
        pytest.skip("native lib unavailable")
    exp = np.zeros(h + 1, np.int64)
    for c in range(nec):
        if c == pseudo:
            continue
        exp[member_head[off[c]:off[c + 1]]] = rank_value[c]
    np.testing.assert_array_equal(out, exp)
