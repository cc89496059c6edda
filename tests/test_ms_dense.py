"""Dense (joint suffix sort) MS vs the sequential host oracle."""
import numpy as np
import pytest

from cmsbwt_tpu.io import fasta
from cmsbwt_tpu.index import host as H
from cmsbwt_tpu.engine.ms_host import ms_scan_collection
from cmsbwt_tpu.ops.ms_dense import ms_dense

from helpers import make_fasta, mutate, random_dna


def build(tmp_path, ref, docs):
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    x = fasta.augment_reference(ref)
    hi = H.build_reference_index(x)
    return hi, x, coll


@pytest.mark.parametrize("seed,reflen,ndocs,snp", [
    (0, 300, 3, 0.02),
    (1, 800, 5, 0.005),
    (2, 500, 4, 0.05),
    (3, 200, 3, 0.0),
    (4, 150, 2, 0.3),
])
def test_dense_matches_host(tmp_path, seed, reflen, ndocs, snp):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, reflen)
    docs = [mutate(rng, ref, snp) for _ in range(ndocs)]
    hi, x, coll = build(tmp_path, ref, docs)
    host = ms_scan_collection(hi, coll.sx, coll.sep_positions)
    dense = ms_dense(x, coll.sx)
    np.testing.assert_array_equal(dense.pos, host.pos)
    np.testing.assert_array_equal(dense.length, host.length)
    np.testing.assert_array_equal(dense.is_head, host.is_head)
    np.testing.assert_array_equal(dense.smaller[host.is_head],
                                  host.smaller[host.is_head])
    # extracted reference index matches the direct build
    np.testing.assert_array_equal(dense.ref_sa, hi.sa)
    np.testing.assert_array_equal(dense.ref_isa, hi.isa)
    np.testing.assert_array_equal(dense.ref_bwt, hi.bwt)


def test_dense_with_augmented_chars(tmp_path):
    rng = np.random.default_rng(6)
    ref = random_dna(rng, 200)
    docs = [b"ACGTNNNNACGT", mutate(rng, ref, 0.01), b"XXYYZZ"]
    hi, x, coll = build(tmp_path, ref, docs)
    host = ms_scan_collection(hi, coll.sx, coll.sep_positions)
    dense = ms_dense(x, coll.sx)
    np.testing.assert_array_equal(dense.pos, host.pos)
    np.testing.assert_array_equal(dense.length, host.length)
    np.testing.assert_array_equal(dense.is_head, host.is_head)
