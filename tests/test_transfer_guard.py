"""Transfer-guard invariant (SURVEY §5 race-detection row): the production
compute paths perform NO implicit host<->device transfers — every upload is
an explicit device_put, every download an explicit device_get. On the real
chip the host link runs at ~33 MB/s, so a stray np.asarray on an O(sn)
array silently destroys throughput; this test makes that a hard error."""
import numpy as np
import jax
import pytest

from cmsbwt_tpu.io.fasta import augment_reference

from helpers import brute_multidoc_bwt, mutate, random_dna


def _workload(tmp_path, seed=3, reflen=1500, ndocs=3, snp=0.02):
    from cmsbwt_tpu.io import fasta
    from helpers import make_inputs
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, reflen)
    docs = [mutate(rng, ref, snp) for _ in range(ndocs)]
    _, _, coll_path = make_inputs(tmp_path, ref, docs)
    coll = fasta.parse_collection(
        str(coll_path), fasta.collection_sn_limit(str(coll_path), 2**63))
    return augment_reference(ref), coll.sx, coll.d


def test_dense_heads_no_implicit_transfers(tmp_path):
    x_aug, sx, _ = _workload(tmp_path)
    from cmsbwt_tpu.ops.ms_dense import ms_dense_heads
    with jax.transfer_guard("disallow"):
        res = ms_dense_heads(x_aug, sx)
    assert res.h > 0


def test_device_resident_pipeline_no_implicit_transfers(tmp_path):
    """The bench path: ms_dense_heads_on_device -> device merge -> runs."""
    x_aug, sx, d = _workload(tmp_path)
    from cmsbwt_tpu.engine.device_merge import merge_heads_device_resident
    from cmsbwt_tpu.ops.ms_dense import ms_dense_heads_on_device
    with jax.transfer_guard("disallow"):
        ddres = ms_dense_heads_on_device(x_aug, sx)
        run_len, run_char, _ = merge_heads_device_resident(
            ddres, d, rle_quirk=False, want_counter=False)
    out = b"".join(bytes([c]) * int(l)
                   for l, c in zip(run_len.tolist(), run_char.tolist()))
    assert out == brute_multidoc_bwt(sx)


def test_jump_heads_no_implicit_transfers(tmp_path):
    x_aug, sx, _ = _workload(tmp_path, seed=5)
    from cmsbwt_tpu.ops.ms_jump import ms_jump_heads
    with jax.transfer_guard("disallow"):
        jres = ms_jump_heads(x_aug, sx, lanes=64)
    assert jres.h > 0
