"""Device MS scan vs host MS scan (exact equality, including chunk-boundary
restarts)."""
import numpy as np
import pytest

from cmsbwt_tpu.io import fasta
from cmsbwt_tpu.index import host as H
from cmsbwt_tpu.index import device as D
from cmsbwt_tpu.engine.ms_host import ms_scan_collection
from cmsbwt_tpu.ops.ms_device import ms_scan_device

from helpers import make_fasta, mutate, random_dna


def build_all(tmp_path, ref, docs):
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    x = fasta.augment_reference(ref)
    hi = H.build_reference_index(x)
    di = D.build_device_index(x)
    return hi, di, coll


@pytest.mark.parametrize("seed,reflen,ndocs,snp,lanes", [
    (0, 300, 3, 0.02, 4),
    (1, 800, 5, 0.005, 16),
    (2, 500, 4, 0.05, 7),    # odd lane count, chunk boundaries everywhere
    (3, 200, 2, 0.0, 3),     # exact copies: long matches, deep skip bursts
])
def test_ms_device_matches_host(tmp_path, seed, reflen, ndocs, snp, lanes):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, reflen)
    docs = [mutate(rng, ref, snp) for _ in range(ndocs)]
    hi, di, coll = build_all(tmp_path, ref, docs)
    host = ms_scan_collection(hi, coll.sx, coll.sep_positions)
    dev = ms_scan_device(di, coll.sx, lanes=lanes, window=32)
    np.testing.assert_array_equal(dev.pos, host.pos)
    np.testing.assert_array_equal(dev.length, host.length)
    np.testing.assert_array_equal(dev.is_head, host.is_head)
    # smaller is only defined at heads (tails carry no smaller bit)
    np.testing.assert_array_equal(dev.smaller[host.is_head],
                                  host.smaller[host.is_head])


def test_ms_device_single_lane_and_many(tmp_path):
    rng = np.random.default_rng(4)
    ref = random_dna(rng, 400)
    docs = [mutate(rng, ref, 0.01), b"ACGTNNN", mutate(rng, ref, 0.01)]
    hi, di, coll = build_all(tmp_path, ref, docs)
    host = ms_scan_collection(hi, coll.sx, coll.sep_positions)
    for lanes in (1, 64):
        dev = ms_scan_device(di, coll.sx, lanes=lanes, window=16)
        np.testing.assert_array_equal(dev.pos, host.pos)
        np.testing.assert_array_equal(dev.is_head, host.is_head)
