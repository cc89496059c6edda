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
    try:
        # CPU-only processes skip the persistent cache: CPU compiles are
        # milliseconds, and sharing the dir with concurrent accelerator
        # processes segfaulted the test suite inside jax's cache read
        # (compilation_cache.get_executable_and_time) — observed twice on
        # full-suite runs overlapping TPU benches.
        if (not os.environ.get("CMSBWT_FORCE_CACHE")
                and all(d.platform == "cpu" for d in jax.devices())):
            _DONE = True
            return
    except Exception:
        pass
    cache_dir = path or os.environ.get(
        "CMSBWT_JAX_CACHE", os.path.expanduser("~/.cache/cmsbwt_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _DONE = True


_RATIO = float(os.environ.get("CMSBWT_BUCKET_RATIO", "1.08"))


def bucket_size(x: int, ratio: float | None = None,
                minimum: int = 1 << 12) -> int:
    """Smallest geometric bucket >= x (stabilizes jit shapes).

    The default ratio trades pad waste (every sort pass carries the pad)
    against compile count: 1.08 caps the dead weight at 8% (measured 23%
    at the 20 Mchar bench config under the old 1.25). The persistent XLA
    cache (enable_compilation_cache) absorbs the extra first-run compiles.
    Override via CMSBWT_BUCKET_RATIO."""
    b = minimum
    r = _RATIO if ratio is None else ratio
    while b < x:
        b = int(b * r) + 1
    return b
