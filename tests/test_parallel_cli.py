"""compute_bwt with dense_parallel over the virtual mesh."""
import numpy as np

from cmsbwt_tpu.config import Config
from cmsbwt_tpu.engine.pipeline import compute_bwt

from helpers import make_inputs, mutate, random_dna


def test_parallel_pipeline_matches_single(tmp_path):
    rng = np.random.default_rng(0)
    ref = random_dna(rng, 400)
    docs = [mutate(rng, ref, 0.01) for _ in range(5)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "a"),
                       backend="dense"))
    compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "b"),
                       backend="dense", dense_block_chars=300,
                       dense_parallel=True))
    assert (tmp_path / "a.bwt").read_bytes() == \
        (tmp_path / "b.bwt").read_bytes()
