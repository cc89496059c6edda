"""Phase timing (replaces the reference's per-phase std::chrono spans,
ref CMS-BWT-functions.cpp:248-309 etc.)."""
from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def maybe_jax_trace(phase: str):
    """jax.profiler trace dump for one phase when CMSBWT_TRACE_DIR is set
    (SURVEY.md §5 tracing row; view with TensorBoard / xprof)."""
    trace_dir = os.environ.get("CMSBWT_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(os.path.join(trace_dir, phase)):
        yield


class PhaseTimer:
    def __init__(self):
        self.phases: list[tuple[str, float]] = []

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases.append((name, time.perf_counter() - t0))

    def total(self) -> float:
        return sum(t for _, t in self.phases)

    def get(self, name: str) -> float:
        return sum(t for n, t in self.phases if n == name)

    def report(self) -> str:
        lines = [f"{n}: {t * 1000:.1f} ms" for n, t in self.phases]
        lines.append(f"total: {self.total() * 1000:.1f} ms")
        return "\n".join(lines)
