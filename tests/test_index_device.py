"""Device (JAX) index layer vs host oracle."""
import numpy as np
import pytest

from cmsbwt_tpu.io.fasta import augment_reference
from cmsbwt_tpu.index import host as H
from cmsbwt_tpu.index import device as D

from helpers import random_dna


@pytest.mark.parametrize("seed,n", [(0, 64), (1, 500), (2, 3000)])
def test_device_index_matches_host(seed, n):
    rng = np.random.default_rng(seed)
    x = augment_reference(random_dna(rng, n))
    hi = H.build_reference_index(x)
    di = D.build_device_index(x)
    np.testing.assert_array_equal(np.asarray(di.sa), hi.sa)
    np.testing.assert_array_equal(np.asarray(di.isa), hi.isa)
    np.testing.assert_array_equal(np.asarray(di.lcp), hi.lcp)
    np.testing.assert_array_equal(np.asarray(di.plcp), hi.plcp)
    np.testing.assert_array_equal(np.asarray(di.bwt), hi.bwt)


def test_device_psv_nsv():
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    x = augment_reference(random_dna(rng, 400))
    hi = H.build_reference_index(x)
    di = D.build_device_index(x)
    n = hi.n
    iq = rng.integers(0, n, size=500).astype(np.int32)
    ub = rng.integers(0, 15, size=500).astype(np.int32)
    got_psv = np.asarray(D.psv_device(di.jump, jnp.asarray(iq),
                                      jnp.asarray(ub), n))
    got_nsv = np.asarray(D.nsv_device(di.jump, jnp.asarray(iq),
                                      jnp.asarray(ub), n))
    for k in range(500):
        assert got_psv[k] == hi.psv(int(iq[k]), int(ub[k]))
        assert got_nsv[k] == hi.nsv(int(iq[k]), int(ub[k]))


def test_device_index_in_pipeline(tmp_path):
    """backend='device' end-to-end equals backend='host'."""
    from cmsbwt_tpu.config import Config
    from cmsbwt_tpu.engine.pipeline import compute_bwt
    from helpers import make_inputs, mutate
    rng = np.random.default_rng(9)
    ref = random_dna(rng, 500)
    docs = [mutate(rng, ref, 0.01) for _ in range(3)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    a = compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "h"),
                           backend="host"))
    b = compute_bwt(Config(filename=str(lst), outname=str(tmp_path / "d"),
                           backend="device"))
    assert (tmp_path / "h.bwt").read_bytes() == (tmp_path / "d.bwt").read_bytes()
