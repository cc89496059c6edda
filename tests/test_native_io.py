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
