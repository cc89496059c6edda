"""Phase timing (replaces the reference's per-phase std::chrono spans,
ref CMS-BWT-functions.cpp:248-309 etc.)."""
from __future__ import annotations

import contextlib
import time


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
