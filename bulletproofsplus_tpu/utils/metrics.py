"""Observability: phase timers, throughput counters, profiler hooks.

The reference's only observability is println! progress markers
(range/mod.rs:87,195,248,412) and one Instant timing inside a test
(affine_point.rs:313-316). Here: structured per-phase wall timings
(setup/commit/prove/verify), analytic MSM op counters, and a jax.profiler
trace hook for TPU timeline capture.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List


class Metrics:
    """Process-wide registry of phase timings and counters."""

    def __init__(self):
        self.timings: Dict[str, List[float]] = defaultdict(list)
        self.counters: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name].append(time.perf_counter() - t0)

    def count(self, name: str, value: float = 1.0):
        self.counters[name] += value

    def msm_ops(self, n_points: int, nbits: int):
        """Analytic point-op count of a double-and-add MSM."""
        self.count("msm.point_ops", n_points * 2 * nbits + n_points)
        self.count("msm.calls", 1)

    def summary(self) -> dict:
        out = {"counters": dict(self.counters), "phases": {}}
        for k, v in self.timings.items():
            out["phases"][k] = {
                "count": len(v),
                "total_s": round(sum(v), 4),
                "min_s": round(min(v), 4),
                "last_s": round(v[-1], 4),
            }
        total = sum(self.timings.get("verify", [0])) or None
        if total and self.counters.get("msm.point_ops"):
            out["counters"]["msm.point_ops_per_s"] = round(
                self.counters["msm.point_ops"] / total, 1
            )
        return out

    def dump(self) -> str:
        return json.dumps(self.summary(), indent=1)

    def reset(self):
        self.timings.clear()
        self.counters.clear()


METRICS = Metrics()


@contextlib.contextmanager
def profiler_trace(logdir: str = "/tmp/bpp_tpu_trace"):
    """Capture a jax.profiler trace (view with tensorboard / xprof)."""
    import jax

    with jax.profiler.trace(logdir):
        yield
