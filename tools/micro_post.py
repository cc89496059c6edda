"""Microbench: _postprocess + _compact_heads + tail_good at primary shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from cmsbwt_tpu.ops import ms_dense as md

n_pad = 1 << 21
sn_pad = 1 << 25  # bucketed 20M
m = n_pad + sn_pad
sn = 20000011
n = 2000130

rng = np.random.default_rng(0)
b = jnp.asarray(rng.integers(60, 90, m, dtype=np.uint8))
pos = jnp.asarray(rng.integers(0, n, sn_pad, dtype=np.int32))
length = jnp.asarray(rng.integers(0, 100, sn_pad, dtype=np.int32))
smaller = jnp.asarray(rng.integers(0, 2, sn_pad).astype(bool))
n_t = md._put_i32(n)
sn_t = md._put_i32(sn)

def timeit(name, f, reps=3):
    outs = f()
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for _ in range(reps):
        outs = f()
        jax.block_until_ready(outs)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms")
    return outs

outs = timeit("postprocess", lambda: md._postprocess(
    b, pos, length, smaller, n_t, sn_t, n_pad, sn_pad))
pos2, length2, smaller2, is_head, h_dev, char = outs
t0 = time.perf_counter()
h = int(np.asarray(h_dev))
print(f"h sync+transfer: {(time.perf_counter()-t0)*1e3:.1f} ms  h={h}")
h_pad = min(md._pow2_pad(max(h, 1)), sn_pad)
timeit("compact_heads", lambda: md._compact_heads(
    pos2, length2, smaller2, is_head, char, sn_pad, h_pad))
