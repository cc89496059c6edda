"""Persistent XLA compilation cache: first-call compile+warmup on the TPU
tunnel costs minutes for large shapes; caching makes it once per machine.
Combined with shape bucketing (ops/ms_dense.py pads inputs to size buckets)
recompiles become rare across runs."""
from __future__ import annotations

import os

_DONE = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax
    cache_dir = path or os.environ.get(
        "CMSBWT_JAX_CACHE", os.path.expanduser("~/.cache/cmsbwt_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _DONE = True


def bucket_size(x: int, ratio: float = 1.25, minimum: int = 1 << 12) -> int:
    """Smallest geometric bucket >= x (stabilizes jit shapes)."""
    b = minimum
    while b < x:
        b = int(b * ratio) + 1
    return b
