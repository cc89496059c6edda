"""Collection / reference parsing semantics (byte-faithful to the reference)."""
import numpy as np

from cmsbwt_tpu.io import fasta

from helpers import make_fasta


def write(tmp_path, data: bytes):
    p = tmp_path / "f.txt"
    p.write_bytes(data)
    return str(p)


def test_leading_header_creates_empty_doc(tmp_path):
    p = write(tmp_path, b">a\nACGT\n>b\nGGTT\n")
    coll = fasta.parse_collection(p, 1 << 60)
    # SX = [sep] ACGT [sep] GGTT [sep]
    assert bytes(coll.sx) == b"\x02ACGT\x02GGTT\x02"
    assert coll.n_separators == 3
    assert coll.d == 4


def test_unterminated_final_line_dropped(tmp_path):
    # std::getline(...).good() drops the final unterminated line
    p = write(tmp_path, b">a\nACGT\nGGG")
    coll = fasta.parse_collection(p, 1 << 60)
    assert bytes(coll.sx) == b"\x02ACGT\x02"


def test_no_header_raw_lines(tmp_path):
    p = write(tmp_path, b"ACGT\nGGTT\n")
    coll = fasta.parse_collection(p, 1 << 60)
    # one document of concatenated lines, EOF block adds the separator
    assert bytes(coll.sx) == b"ACGTGGTT\x02"
    assert coll.d == 2


def test_empty_line_flushes_doc(tmp_path):
    p = write(tmp_path, b"AC\n\nGT\n")
    coll = fasta.parse_collection(p, 1 << 60)
    assert bytes(coll.sx) == b"AC\x02GT\x02"


def test_prefix_truncation_midline(tmp_path):
    # sn_limit cuts so that total content+separators == sn_limit
    p = write(tmp_path, b">a\nAAAA\nCCCC\nGGGG\n")
    coll = fasta.parse_collection(p, 8)
    # leading sep (1) + chars up to 7 total, then final separator -> 8
    assert len(coll.sx) == 8
    assert bytes(coll.sx) == b"\x02AAAACC\x02"


def test_prefix_exact_boundary(tmp_path):
    p = write(tmp_path, b">a\nAAAA\nCCCC\n")
    coll = fasta.parse_collection(p, 6)
    assert bytes(coll.sx) == b"\x02AAAAC"[:5] + b"\x02"
    assert len(coll.sx) == 6


def test_reference_loader_fasta_and_raw(tmp_path):
    fa = write(tmp_path, b">r\nACGT\nACCA\n")
    assert fasta.load_reference_bytes(fa) == b"ACGTACCA"
    raw = write(tmp_path, b"ACGTTT")
    assert fasta.load_reference_bytes(raw) == b"ACGTTT"
    # trailing newline then $ stripping
    raw2 = write(tmp_path, b"ACGT$\n")
    assert fasta.load_reference_bytes(raw2) == b"ACGT"


def test_make_fasta_roundtrip(tmp_path):
    docs = [b"ACGTACGTACGT", b"GG"]
    p = write(tmp_path, make_fasta(docs, width=5))
    coll = fasta.parse_collection(p, 1 << 60)
    assert bytes(coll.sx) == b"\x02" + b"\x02".join(docs) + b"\x02"
