"""Structured metrics: per-stage timing + run counters.

Replaces the reference's stdout prose and ROS status topics (SURVEY.md §5.5:
"structured per-frame record + timing per stage"). FrameRecord (tracking.py)
carries the per-frame fields; this module adds host-side stage timers and a
run summary the CLI prints at exit (and tests can assert on).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class StageTimers:
    """Wall-clock accumulators per pipeline stage."""

    def __init__(self):
        self.total_s: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.total_s[stage] += time.perf_counter() - t0
            self.count[stage] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            s: {"total_ms": 1e3 * self.total_s[s],
                "mean_ms": 1e3 * self.total_s[s] / max(self.count[s], 1),
                "count": self.count[s]}
            for s in sorted(self.total_s)
        }
