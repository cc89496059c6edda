"""Multi-device blocked dense execution on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from cmsbwt_tpu.io import fasta
from cmsbwt_tpu.ops.ms_dense import ms_dense_heads
from cmsbwt_tpu.parallel.blocked import ms_dense_heads_parallel

from helpers import make_fasta, mutate, random_dna


def build(tmp_path, ref, docs):
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    x = fasta.augment_reference(ref)
    return x, coll


@pytest.mark.parametrize("seed,reflen,ndocs,snp,block", [
    (0, 300, 5, 0.02, 250),
    (1, 400, 6, 0.005, 333),
])
def test_parallel_blocks_match_single(tmp_path, seed, reflen, ndocs, snp,
                                      block):
    assert len(jax.local_devices()) == 8
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, reflen)
    docs = [mutate(rng, ref, snp) for _ in range(ndocs)]
    x, coll = build(tmp_path, ref, docs)
    single = ms_dense_heads(x, coll.sx)
    par = ms_dense_heads_parallel(x, coll.sx, block_chars=block,
                                  ctx_chars=64)
    np.testing.assert_array_equal(par.head_t, single.head_t)
    np.testing.assert_array_equal(par.head_pos, single.head_pos)
    np.testing.assert_array_equal(par.head_len, single.head_len)
    np.testing.assert_array_equal(par.head_smaller, single.head_smaller)
    np.testing.assert_array_equal(par.head_char, single.head_char)
    assert par.h == single.h


def test_parallel_exact_copy_retries(tmp_path):
    rng = np.random.default_rng(3)
    ref = random_dna(rng, 300)
    d = mutate(rng, ref, 0.0)
    x, coll = build(tmp_path, ref, [d, d, d])
    single = ms_dense_heads(x, coll.sx)
    par = ms_dense_heads_parallel(x, coll.sx, block_chars=120, ctx_chars=16)
    np.testing.assert_array_equal(par.head_t, single.head_t)