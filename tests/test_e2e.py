"""End-to-end oracle: pipeline .bwt must equal the brute-force multi-document
BWT of the collection (SURVEY.md §4 oracle tests)."""
import numpy as np
import pytest

from cmsbwt_tpu.config import Config
from cmsbwt_tpu.engine import merge as merge_mod
from cmsbwt_tpu.engine.pipeline import compute_bwt, compute_bwt_arrays
from cmsbwt_tpu.index.host import build_reference_index
from cmsbwt_tpu.io import fasta

from helpers import brute_multidoc_bwt, make_inputs, mutate, random_dna


def run_case(tmp_path, ref: bytes, docs: list[bytes], **kw):
    lst, _, coll_path = make_inputs(tmp_path, ref, docs, **kw)
    cfg = Config(filename=str(lst), outname=str(tmp_path / "out"))
    out = compute_bwt(cfg)
    got = open(out["out_path"], "rb").read()
    coll = fasta.parse_collection(
        str(coll_path), fasta.collection_sn_limit(str(coll_path), 2**64 - 1))
    expect = brute_multidoc_bwt(coll.sx)
    return got, expect


@pytest.mark.parametrize("seed,reflen,ndocs,snp", [
    (0, 200, 3, 0.02),
    (1, 500, 5, 0.005),
    (2, 300, 4, 0.05),
    (3, 1000, 8, 0.001),
])
def test_e2e_mutated_copies(tmp_path, seed, reflen, ndocs, snp):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, reflen)
    docs = [mutate(rng, ref, snp) for _ in range(ndocs)]
    got, expect = run_case(tmp_path, ref, docs)
    assert got == expect


def test_e2e_random_unrelated(tmp_path):
    rng = np.random.default_rng(42)
    ref = random_dna(rng, 150)
    docs = [random_dna(rng, 80), random_dna(rng, 60)]
    got, expect = run_case(tmp_path, ref, docs)
    assert got == expect


def test_e2e_exact_duplicates(tmp_path):
    """Exact duplicate documents exercise the counterBad tie path."""
    rng = np.random.default_rng(5)
    ref = random_dna(rng, 200)
    d = mutate(rng, ref, 0.01)
    got, expect = run_case(tmp_path, ref, [d, d, d])
    assert got == expect


def test_e2e_chars_absent_from_reference(tmp_path):
    """Collection chars not in the raw reference (alphabet augmentation)."""
    rng = np.random.default_rng(6)
    ref = random_dna(rng, 120)
    docs = [b"ACGTNNNNACGT", b"NNXYZNN"]
    got, expect = run_case(tmp_path, ref, docs)
    assert got == expect


def test_e2e_tiny_docs_and_empty(tmp_path):
    rng = np.random.default_rng(7)
    ref = random_dna(rng, 100)
    docs = [b"A", ref[:5], b"", b"G"]
    got, expect = run_case(tmp_path, ref, docs)
    assert got == expect


def test_e2e_indels(tmp_path):
    rng = np.random.default_rng(8)
    ref = random_dna(rng, 400)
    docs = [mutate(rng, ref, 0.01, indel_rate=0.005) for _ in range(4)]
    got, expect = run_case(tmp_path, ref, docs)
    assert got == expect


def test_rle_decode_matches_plain(tmp_path):
    rng = np.random.default_rng(9)
    ref = random_dna(rng, 300)
    docs = [mutate(rng, ref, 0.01) for _ in range(4)]
    lst, _, coll_path = make_inputs(tmp_path, ref, docs)
    cfg = Config(filename=str(lst), outname=str(tmp_path / "o1"))
    plain = open(compute_bwt(cfg)["out_path"], "rb").read()
    cfg2 = Config(filename=str(lst), outname=str(tmp_path / "o2"), rle=True,
                  replicate_reference_rle_quirk=False)
    rle = open(compute_bwt(cfg2)["out_path"], "rb").read()
    # decode
    rec = np.frombuffer(rle, dtype=np.uint8).reshape(-1, 9)
    lens = rec[:, :8].copy().view(np.uint64).ravel()
    chars = rec[:, 8]
    decoded = np.repeat(chars, lens.astype(np.int64)).tobytes()
    assert decoded == plain
    # runs are maximal: no two adjacent records share a char
    assert np.all(chars[1:] != chars[:-1])


def test_prefix_length_flag(tmp_path):
    rng = np.random.default_rng(10)
    ref = random_dna(rng, 200)
    docs = [mutate(rng, ref, 0.02) for _ in range(3)]
    lst, _, coll_path = make_inputs(tmp_path, ref, docs)
    cfg = Config(filename=str(lst), outname=str(tmp_path / "out"),
                 prefix_length=150)
    out = compute_bwt(cfg)
    got = open(out["out_path"], "rb").read()
    coll = fasta.parse_collection(str(coll_path), 150)
    expect = brute_multidoc_bwt(coll.sx)
    assert len(got) == len(coll.sx)
    assert got == expect
