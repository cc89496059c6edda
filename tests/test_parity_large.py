"""Large-path parity vs the compiled reference binary.

The reference dispatches on ``_n < 1'000'000`` (CMS-BWT-functions.cpp:1792):
references >= 1e6 take ``process_collection_large_reference``
(:1093-1785) — the chunked ``.phrases`` spill, the sparse
``unordered_map`` head grouping, and the direct (unbuffered) tail
positioning. The round-1 suite never exercised that variant against the
binary; these tests do, plus a many-document config that stresses the
separator-rank paths and the dense alphabet-capacity bound.

Marked slow: ~1-2 min total on CPU. Run with ``pytest -m slow`` or the
default full suite (no marker filter deselects them here).
"""
import pathlib
import subprocess

import numpy as np
import pytest

from cmsbwt_tpu.config import Config
from cmsbwt_tpu.engine.pipeline import compute_bwt

from helpers import make_inputs, mutate, random_dna

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_BIN = REPO / "baseline" / "cms-bwt-ref"


@pytest.fixture(scope="session")
def ref_bin():
    if not REF_BIN.exists():
        r = subprocess.run([str(REPO / "baseline" / "build.sh")],
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"reference build failed: {r.stderr[-500:]}")
    return str(REF_BIN)


def run_both(tmp_path, ref_bin, ref, docs, rle, backend, **cfg_kw):
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    args = [ref_bin] + (["-r"] if rle else []) + \
        ["-o", str(tmp_path / "ref"), str(lst)]
    subprocess.run(args, check=True, capture_output=True)
    compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "ours"),
                       rle=rle, backend=backend, **cfg_kw))
    ext = ".rl_bwt" if rle else ".bwt"
    return ((tmp_path / ("ours" + ext)).read_bytes(),
            (tmp_path / ("ref" + ext)).read_bytes())


@pytest.mark.slow
@pytest.mark.parametrize("rle", [False, True])
def test_large_reference_path(tmp_path, ref_bin, rle):
    """1.2 Mbp reference -> the binary's large variant; low SNP keeps the
    host backend's per-factor loop fast (~1.2k factors/doc)."""
    rng = np.random.default_rng(100)
    ref = random_dna(rng, 1_200_000)
    docs = [mutate(rng, ref, 0.001) for _ in range(2)]
    ours, refs = run_both(tmp_path, ref_bin, ref, docs, rle, "host")
    assert ours == refs
    # no small-path debug artifact on the large path (ref :919-924 is
    # small-variant only)
    assert not (tmp_path / "ref.counterSmallerThanHead_true").exists()


@pytest.mark.slow
def test_large_reference_path_dense(tmp_path, ref_bin):
    """Dense (joint suffix sort) backend against the binary's large
    variant, including the blocked streaming path."""
    rng = np.random.default_rng(101)
    ref = random_dna(rng, 1_100_000)
    docs = [mutate(rng, ref, 0.002) for _ in range(2)]
    ours, refs = run_both(tmp_path, ref_bin, ref, docs, False, "dense")
    assert ours == refs
    ours_b, refs_b = run_both(tmp_path, ref_bin, ref, docs, True, "dense",
                              dense_block_chars=700_000)
    assert ours_b == refs_b


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["host", "dense"])
def test_many_documents(tmp_path, ref_bin, backend):
    """600 documents: doc-end pseudo-heads get ranks 1..D-1 (ref :630-645);
    stresses separator ordering and the dense key-packing capacity
    (max_char+1)*(S+1) with many separators."""
    rng = np.random.default_rng(102)
    ref = random_dna(rng, 2_000)
    base = mutate(rng, ref, 0.01)
    docs = [mutate(rng, base, 0.005) for _ in range(600)]
    for rle in (False, True):
        ours, refs = run_both(tmp_path, ref_bin, ref, docs, rle, backend)
        assert ours == refs
