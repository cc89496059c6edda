"""Edge cases and determinism invariants."""
import numpy as np
import pytest

from cmsbwt_tpu.config import Config
from cmsbwt_tpu.engine.pipeline import compute_bwt
from cmsbwt_tpu.io import fasta

from helpers import brute_multidoc_bwt, make_inputs, mutate, random_dna


def test_empty_collection_file(tmp_path):
    ref = b"ACGTACGT" * 10
    (tmp_path / "ref.fa").write_bytes(b">r\n" + ref + b"\n")
    (tmp_path / "coll.fa").write_bytes(b"")
    lst = tmp_path / "in.txt"
    lst.write_bytes(str(tmp_path / "ref.fa").encode() + b"\n" +
                    str(tmp_path / "coll.fa").encode() + b"\n")
    out = compute_bwt(Config(filename=str(lst),
                             outname=str(tmp_path / "o")))
    assert (tmp_path / "o.bwt").read_bytes() == b""


def test_single_empty_doc(tmp_path):
    ref = b"ACGTACGT" * 10
    (tmp_path / "ref.fa").write_bytes(ref)
    (tmp_path / "coll.fa").write_bytes(b">only\n")
    lst = tmp_path / "in.txt"
    lst.write_bytes(str(tmp_path / "ref.fa").encode() + b"\n" +
                    str(tmp_path / "coll.fa").encode() + b"\n")
    out = compute_bwt(Config(filename=str(lst),
                             outname=str(tmp_path / "o")))
    # one separator doc: BWT = the separator char itself
    assert (tmp_path / "o.bwt").read_bytes() == b"\x02"


def test_single_char_docs(tmp_path):
    rng = np.random.default_rng(0)
    ref = random_dna(rng, 64)
    lst, _, coll_path = make_inputs(tmp_path, ref, [b"A", b"C", b"G"])
    compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "o")))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    assert (tmp_path / "o.bwt").read_bytes() == brute_multidoc_bwt(coll.sx)


def test_determinism_across_runs(tmp_path):
    """Race-detection stand-in (SURVEY §5): repeated runs must be
    bit-identical across backends."""
    rng = np.random.default_rng(1)
    ref = random_dna(rng, 300)
    docs = [mutate(rng, ref, 0.02) for _ in range(3)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    outs = []
    for i, backend in enumerate(["host", "dense", "dense"]):
        compute_bwt(Config(filename=str(lst),
                           outname=str(tmp_path / f"o{i}"),
                           backend=backend))
        outs.append((tmp_path / f"o{i}.bwt").read_bytes())
    assert outs[0] == outs[1] == outs[2]


def test_doc_larger_than_ref(tmp_path):
    rng = np.random.default_rng(2)
    ref = random_dna(rng, 100)
    doc = (ref * 5)[:450] + b"TTTT"
    lst, _, coll_path = make_inputs(tmp_path, ref, [doc])
    compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "o"),
                       backend="dense"))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    assert (tmp_path / "o.bwt").read_bytes() == brute_multidoc_bwt(coll.sx)
