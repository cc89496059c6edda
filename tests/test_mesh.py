"""Mesh-native dense pipeline (parallel/mesh.py): shard_map waves over the
8-device virtual mesh must reproduce single-device results exactly, through
to final BWT bytes."""
from __future__ import annotations

import numpy as np

import jax

from helpers import random_dna, mutate
from cmsbwt_tpu.io.fasta import augment_reference, SEPARATOR
from cmsbwt_tpu.ops.ms_dense import ms_dense_heads
from cmsbwt_tpu.parallel.mesh import make_mesh, ms_dense_heads_mesh
from cmsbwt_tpu.engine.pipeline import (dense_result_to_inputs,
                                        merge_from_heads)


def _mk(seed, ref_len, n_docs, snp):
    rng = np.random.default_rng(seed)
    ref = random_dna(rng, ref_len)
    docs = [np.frombuffer(mutate(rng, ref, snp), np.uint8)
            for _ in range(n_docs)]
    sep = np.full(1, SEPARATOR, np.uint8)
    sx = np.concatenate([sep] + [np.concatenate([dc, sep]) for dc in docs])
    return np.frombuffer(augment_reference(ref), np.uint8).copy(), sx


def test_mesh_heads_match_single_device():
    x_aug, sx = _mk(0, 500, 6, 0.02)
    single = ms_dense_heads(x_aug, sx)
    mesh = make_mesh(8)
    par = ms_dense_heads_mesh(x_aug, sx, block_chars=400, ctx_chars=128,
                              mesh=mesh)
    assert par.h == single.h
    np.testing.assert_array_equal(par.head_t, single.head_t)
    np.testing.assert_array_equal(par.head_pos, single.head_pos)
    np.testing.assert_array_equal(par.head_len, single.head_len)
    np.testing.assert_array_equal(par.head_smaller, single.head_smaller)
    np.testing.assert_array_equal(par.head_char, single.head_char)
    np.testing.assert_array_equal(par.ref_sa, single.ref_sa)
    np.testing.assert_array_equal(par.ref_isa, single.ref_isa)


def test_mesh_final_bytes_match():
    x_aug, sx = _mk(3, 400, 5, 0.03)
    d = int((sx == SEPARATOR).sum())
    mesh = make_mesh(jax.device_count())
    par = ms_dense_heads_mesh(x_aug, sx, block_chars=300, ctx_chars=128,
                              mesh=mesh)
    single = ms_dense_heads(x_aug, sx)
    for dres in (par,):
        index, heads = dense_result_to_inputs(x_aug, dres)
        r = merge_from_heads(index, heads, d, len(sx), rle_quirk=False)
        index_s, heads_s = dense_result_to_inputs(x_aug, single)
        r_s = merge_from_heads(index_s, heads_s, d, len(sx),
                               rle_quirk=False)
        np.testing.assert_array_equal(r.run_len, r_s.run_len)
        np.testing.assert_array_equal(r.run_char, r_s.run_char)


def test_mesh_fallback_on_tiny_caps():
    """Force a capacity overflow: the mesh path must fall back to the
    sequential scanner and still be exact."""
    x_aug, sx = _mk(1, 300, 4, 0.05)
    single = ms_dense_heads(x_aug, sx)
    mesh = make_mesh(4)
    par = ms_dense_heads_mesh(x_aug, sx, block_chars=200, ctx_chars=64,
                              mesh=mesh, h_cap_frac=4096,
                              rho_cap_frac=4096)
    assert par.h == single.h
    np.testing.assert_array_equal(par.head_pos, single.head_pos)
