"""Capacity-bounded mesh exchanges (parallel/dist.py capacity contract):
buffers are cap_factor*ceil(local/R)+8 rows per (src, dest) bucket, rows
past the cap drop with a recorded overflow flag, and the merge driver
retries with a doubled factor until clean."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import cmsbwt_tpu.parallel.dist as D


def test_cap_rows_formula():
    D.set_cap_factor(None)
    assert D._cap_rows(64, 8) == 64          # uncapped = full local grid
    D.set_cap_factor(2)
    assert D._cap_rows(64, 8) == 2 * 8 + 8   # capped
    D.set_cap_factor(8)
    assert D._cap_rows(64, 8) == 64          # factor >= R = old grid
    D.set_cap_factor(None)


def _dsort_with_flag(keys_np, cap_factor):
    R = 8
    local = len(keys_np) // R
    mesh = D.make_mesh(R)
    D.set_cap_factor(cap_factor)
    try:
        def body(k, p):
            with D.overflow_scope() as fl:
                (k2,), (p2,) = D.dsort([k], [p], local, R)
                ovf = D.overflow_any(fl)
            return k2, p2, ovf[None]

        with jax.enable_x64(True):
            k = D.shard(mesh, keys_np.astype(np.int64), D.I64_MAX, local)
            p = D.shard(mesh, np.arange(len(keys_np), dtype=np.int64), 0,
                        local)
            k2, p2, ovf = jax.shard_map(
                body, mesh=mesh, in_specs=(P(D.AXIS),) * 2,
                out_specs=(P(D.AXIS),) * 3)(k, p)
            return (np.asarray(k2), np.asarray(p2),
                    bool(np.asarray(ovf)[0]))
    finally:
        D.set_cap_factor(None)


def test_dsort_uncapped_vs_capped_uniform():
    """Uniform keys: a generous cap neither overflows nor changes the
    result."""
    rng = np.random.default_rng(0)
    keys = rng.permutation(512).astype(np.int64)
    k_ref, p_ref, ovf_ref = _dsort_with_flag(keys, None)
    assert not ovf_ref
    k_cap, p_cap, ovf_cap = _dsort_with_flag(keys, 4)
    assert not ovf_cap
    np.testing.assert_array_equal(k_cap, k_ref)
    np.testing.assert_array_equal(p_cap, p_ref)


def test_dsort_skew_overflows_and_flags():
    """All-equal keys land in one destination bucket: a tight cap MUST
    raise the overflow flag (rows were dropped -> caller retries)."""
    keys = np.zeros(512, np.int64)
    _, _, ovf = _dsort_with_flag(keys, 1)
    assert ovf
    # factor >= R is the full grid: no overflow, exact result
    k2, p2, ovf2 = _dsort_with_flag(keys, 8)
    assert not ovf2
    assert np.all(k2 == 0)


def test_merge_retry_stays_byte_equal(monkeypatch):
    """A cap factor of 1 forces overflow retries on a real merge; the
    output must still match the uncapped single-device merge."""
    from cmsbwt_tpu.engine.device_merge import merge_heads_numpy
    from cmsbwt_tpu.io import fasta
    from cmsbwt_tpu.ops.ms_dense import ms_dense_heads
    from cmsbwt_tpu.parallel.sharded_merge import merge_heads_sharded

    rng = np.random.default_rng(5)
    alpha = np.frombuffer(b"ACGT", np.uint8)
    ref = rng.choice(alpha, size=500)
    docs = []
    for _ in range(3):
        a = ref.copy()
        idx = rng.choice(len(a), 15, replace=False)
        a[idx] = rng.choice(alpha, size=15)
        docs.append(a)
    sx = np.concatenate(
        [np.concatenate([d, np.array([2], np.uint8)]) for d in docs])
    x_aug = fasta.augment_reference(ref.tobytes())
    single = ms_dense_heads(x_aug, sx)
    d = 3
    n = len(x_aug)
    rl0, rc0, _ = merge_heads_numpy(
        single.head_t, single.head_pos, single.head_len,
        single.head_smaller, single.head_char, single.ref_sa,
        single.ref_isa, single.ref_bwt, single.h, n, single.sn, d,
        False, want_counter=False)
    monkeypatch.setenv("CMSBWT_SHARD_CAP_FACTOR", "1")
    rl1, rc1 = merge_heads_sharded(
        single.head_t, single.head_pos, single.head_len,
        single.head_smaller, single.head_char, single.ref_sa,
        single.ref_isa, single.ref_bwt, single.h, n, single.sn, d,
        False, n_devices=8)
    np.testing.assert_array_equal(rl1, rl0)
    np.testing.assert_array_equal(rc1, rc0)
