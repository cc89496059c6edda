"""Native vs numpy tail positioning equivalence."""
import numpy as np

import cmsbwt_tpu.engine.tails as tails_mod
import cmsbwt_tpu.io.native as native_mod
from cmsbwt_tpu.engine import heads as heads_mod
from cmsbwt_tpu.engine import ranking as ranking_mod
from cmsbwt_tpu.engine.ms_host import ms_scan_collection
from cmsbwt_tpu.index.host import build_reference_index
from cmsbwt_tpu.io import fasta

from helpers import make_fasta, mutate, random_dna


def test_native_matches_numpy(tmp_path, monkeypatch):
    rng = np.random.default_rng(3)
    ref = random_dna(rng, 500)
    d = mutate(rng, ref, 0.01)
    docs = [d, d, mutate(rng, ref, 0.02), d]   # duplicates: exact ties
    coll_path = tmp_path / "c.fa"
    coll_path.write_bytes(make_fasta(docs))
    coll = fasta.parse_collection(str(coll_path), 1 << 60)
    x = fasta.augment_reference(ref)
    index = build_reference_index(x)
    ms = ms_scan_collection(index, coll.sx, coll.sep_positions)
    heads = heads_mod.extract_heads(index, ms, coll.sx)
    heads_mod.fixup_heads(index, heads)
    classes = heads_mod.build_classes(index, heads)
    ranked = ranking_mod.rank_heads(index, classes, heads, coll.d)

    a = tails_mod.position_tails(index, classes, ranked)      # native
    monkeypatch.setattr(native_mod, "position_tails_native",
                        lambda *args, **kw: None)
    # reload reference in tails (it imports the symbol per call)
    monkeypatch.setattr("cmsbwt_tpu.io.native.position_tails_native",
                        lambda *args, **kw: None)
    b = tails_mod.position_tails(index, classes, ranked)      # numpy
    np.testing.assert_array_equal(a, b)
