"""Blocked dense pipeline vs single-shot dense (exactness incl. adaptive
context retry)."""
import numpy as np
import pytest

from cmsbwt_tpu.io import fasta
from cmsbwt_tpu.ops.ms_dense import ms_dense_heads, ms_dense_heads_blocked

from helpers import make_fasta, mutate, random_dna


def build(tmp_path, ref, docs):
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    x = fasta.augment_reference(ref)
    return x, coll


def assert_same(a, b):
    np.testing.assert_array_equal(a.head_t, b.head_t)
    np.testing.assert_array_equal(a.head_pos, b.head_pos)
    np.testing.assert_array_equal(a.head_len, b.head_len)
    np.testing.assert_array_equal(a.head_smaller, b.head_smaller)
    np.testing.assert_array_equal(a.head_char, b.head_char)
    np.testing.assert_array_equal(a.ref_sa, b.ref_sa)
    assert a.h == b.h


@pytest.mark.parametrize("seed,reflen,ndocs,snp,block,ctx", [
    (0, 300, 4, 0.02, 400, 64),
    (1, 500, 5, 0.005, 700, 128),
    (2, 200, 3, 0.0, 150, 32),     # exact copies: long matches force retries
    (3, 400, 4, 0.05, 333, 50),    # odd block size
])
def test_blocked_matches_single(tmp_path, seed, reflen, ndocs, snp, block,
                                ctx):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, reflen)
    docs = [mutate(rng, ref, snp) for _ in range(ndocs)]
    x, coll = build(tmp_path, ref, docs)
    single = ms_dense_heads(x, coll.sx)
    blocked = ms_dense_heads_blocked(x, coll.sx, block_chars=block,
                                     ctx_chars=ctx)
    assert_same(single, blocked)


def test_blocked_tiny_context_forced_retry(tmp_path):
    """Context far smaller than match lengths: the retry loop must converge
    to exact results."""
    rng = np.random.default_rng(7)
    ref = random_dna(rng, 400)
    d = mutate(rng, ref, 0.002)
    x, coll = build(tmp_path, ref, [d, d])
    single = ms_dense_heads(x, coll.sx)
    blocked = ms_dense_heads_blocked(x, coll.sx, block_chars=100,
                                     ctx_chars=8)
    assert_same(single, blocked)


def test_blocked_end_to_end_parity(tmp_path):
    """Blocked heads through the merge engine equal the brute oracle."""
    from cmsbwt_tpu.engine.heads import HeadArrays
    from cmsbwt_tpu.engine.pipeline import merge_from_heads
    from cmsbwt_tpu.engine.merge import runs_to_plain
    from cmsbwt_tpu.index.host import ReferenceIndex
    from helpers import brute_multidoc_bwt

    rng = np.random.default_rng(9)
    ref = random_dna(rng, 350)
    docs = [mutate(rng, ref, 0.01) for _ in range(4)]
    x, coll = build(tmp_path, ref, docs)
    dres = ms_dense_heads_blocked(x, coll.sx, block_chars=300, ctx_chars=64)
    index = ReferenceIndex(
        x=x, x_padded=np.concatenate([x, np.zeros(1, np.uint8)]),
        n=len(x), sa=dres.ref_sa, isa=dres.ref_isa,
        lcp=np.zeros(len(x) + 1, np.int32),
        plcp=np.zeros(len(x), np.int32), bwt=dres.ref_bwt,
        rank_history=[])
    heads = HeadArrays(
        t=dres.head_t, pos=dres.head_pos, length=dres.head_len,
        smaller=dres.head_smaller, char=dres.head_char,
        to_next=np.zeros(dres.h, np.int64),
        isa_next=np.zeros(dres.h, np.int64),
        succ=np.zeros(dres.h, np.int64), h=dres.h)
    result = merge_from_heads(index, heads, coll.d, coll.sn,
                              rle_quirk=False)
    got = runs_to_plain(result.run_len, result.run_char)
    assert got == brute_multidoc_bwt(coll.sx)