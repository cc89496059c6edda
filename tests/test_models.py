"""Flagship model API (models/cms_bwt.py)."""
import numpy as np

from cmsbwt_tpu.models.cms_bwt import CMSBWT
from cmsbwt_tpu.io import fasta

from helpers import brute_multidoc_bwt, make_fasta, mutate, random_dna


def test_model_transform_matches_oracle(tmp_path):
    rng = np.random.default_rng(0)
    ref = random_dna(rng, 300)
    docs = [mutate(rng, ref, 0.02) for _ in range(3)]
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    model = CMSBWT(ref)
    res = model.transform(str(coll_path))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    assert res.bwt == brute_multidoc_bwt(coll.sx)
    # reuse the same index for a second collection
    docs2 = [mutate(rng, ref, 0.01)]
    p2 = tmp_path / "c2.fa"
    p2.write_bytes(make_fasta(docs2))
    res2 = model.transform(str(p2), rle=True)
    assert res2.rle is not None


def test_model_dense_backend(tmp_path):
    rng = np.random.default_rng(1)
    ref = random_dna(rng, 250)
    docs = [mutate(rng, ref, 0.02) for _ in range(2)]
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    model = CMSBWT(ref)
    a = model.transform(str(coll_path), backend="host")
    b = model.transform(str(coll_path), backend="dense")
    assert a.bwt == b.bwt


def test_model_jump_backend(tmp_path):
    """CMSBWT.transform honors backend='jump' (head-jumping scan
    into the shared merge engine); bytes match the host backend."""
    import numpy as np
    from helpers import mutate, random_dna
    from cmsbwt_tpu.models.cms_bwt import CMSBWT
    rng = np.random.default_rng(21)
    ref = random_dna(rng, 600)
    docs = [mutate(rng, ref, 0.01) for _ in range(3)]
    coll_path = tmp_path / "coll.fa"
    with open(coll_path, "wb") as f:
        for i, d in enumerate(docs):
            f.write(b">d%d\n" % i + d + b"\n")
    model = CMSBWT(ref)
    base = model.transform(str(coll_path), backend="host").bwt
    for be in ("jump",):
        got = model.transform(str(coll_path), backend=be).bwt
        assert got == base, be
