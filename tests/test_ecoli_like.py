"""Medium-divergence (E.coli-like) configs: SNPs + indels + rearrangements."""
import pathlib
import subprocess

import numpy as np
import pytest

from cmsbwt_tpu.config import Config
from cmsbwt_tpu.engine.pipeline import compute_bwt

from helpers import make_inputs, mutate, random_dna

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_BIN = REPO / "baseline" / "cms-bwt-ref"


def rearrange(rng, seq: bytes) -> bytes:
    """Random segment reversal + transposition (structural variation)."""
    arr = bytearray(seq)
    n = len(arr)
    a, b = sorted(rng.integers(0, n, 2))
    arr[a:b] = arr[a:b][::-1]
    c = int(rng.integers(0, n))
    seg = arr[a:b]
    del arr[a:b]
    arr[c:c] = seg[: len(seg) // 2]
    return bytes(arr)


@pytest.mark.parametrize("rle", [False, True])
def test_ecoli_like_parity(tmp_path, rle):
    if not REF_BIN.exists():
        r = subprocess.run([str(REPO / "baseline" / "build.sh")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("reference build failed")
    rng = np.random.default_rng(0)
    ref = random_dna(rng, 2000)
    docs = []
    for i in range(6):
        d = mutate(rng, ref, 0.02, indel_rate=0.005)
        if i % 2:
            d = rearrange(rng, d)
        docs.append(d)
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    args = [str(REF_BIN)] + (["-r"] if rle else []) +         ["-o", str(tmp_path / "ref"), str(lst)]
    subprocess.run(args, check=True, capture_output=True)
    cfg = Config(filename=str(lst), outname=str(tmp_path / "ours"),
                 backend="dense", rle=rle)
    compute_bwt(cfg)
    ext = ".rl_bwt" if rle else ".bwt"
    assert (tmp_path / ("ours" + ext)).read_bytes() ==         (tmp_path / ("ref" + ext)).read_bytes()
