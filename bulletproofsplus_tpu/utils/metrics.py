"""Observability: phase timers, throughput counters, speed-of-light model,
profiler hooks.

The reference's only observability is println! progress markers
(range/mod.rs:87,195,248,412) and one Instant timing inside a test
(affine_point.rs:313-316). Here: structured per-phase wall timings
(setup/commit/prove/verify), analytic MSM op counters, a per-chip
speed-of-light model (BASELINE.md: "MSM point-ops/s vs per-chip
speed-of-light"), and a jax.profiler trace hook for TPU timeline capture.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, List

# ---------------------------------------------------------------------------
# speed-of-light model
# ---------------------------------------------------------------------------

# Per-chip int32 multiply throughput of the VPU. Model for TPU v5e: 8x128
# vector lanes x ~940 MHz x 1 int32 multiply per lane-cycle ≈ 0.96e12/s
# (the MXU does not help: limb products need exact 24-bit-plus integer
# accumulation, outside bf16/int8 MXU reach). Override for other chips via
# BPP_SOL_INT32_MULS.
VPU_INT32_MULS_PER_S = float(os.environ.get("BPP_SOL_INT32_MULS", "0.96e12"))

# point-op costs in field multiplications (squarings counted as muls):
# edwards extended add-2008-hwcd-3 = 9M (incl. k2d), dbl-2008-hwcd = 7M;
# weierstrass RCB a=0 add = 14M (12M + 2 b3-muls), dbl = 10M.
POINT_MULS = {
    4: {"add": 9.0, "dbl": 7.0},   # COORDS=4: extended edwards
    3: {"add": 14.0, "dbl": 10.0},  # COORDS=3: projective weierstrass
}


def field_mul_int32_muls(curve) -> float:
    """int32 multiplies per modular multiplication: schoolbook L² partial
    products plus the separated Montgomery reduction's two more L²-sized
    shear-multiplies (fields/ops.py::_mul_wide/_redc) ≈ 3·L²."""
    L = curve.fp.L
    return 3.0 * L * L


def point_op_sol_per_s(curve, op: str = "add") -> float:
    """Speed-of-light vectorized point ops/s for this curve on this chip
    (multiplication-bound model; adds/carries ride the same lanes)."""
    muls = POINT_MULS[getattr(curve, "COORDS", 3)][op]
    return VPU_INT32_MULS_PER_S / (muls * field_mul_int32_muls(curve))


def ladder_point_ops(n_lanes: int, nbits: int, window: int = 4) -> dict:
    """Analytic op count of the windowed-ladder MSM (msm/engine.py)."""
    nwin = -(-nbits // window)
    return {
        "dbl": n_lanes * nwin * window,
        "add": n_lanes * (nwin + (1 << window) - 1),
    }


def pippenger_point_ops(n_lanes: int, nbits: int, window: int = 6,
                        slices: int = 16) -> dict:
    """Analytic op count of the bucket MSM (msm/pippenger.py)."""
    nwin = -(-nbits // window)
    B = 1 << window
    merge = (slices.bit_length() - 1) * nwin * B
    reduction = 2 * nwin * B * (window + 1) // window  # suffix + tree levels
    return {"dbl": nbits, "add": n_lanes * nwin + merge + reduction}


def fixed_point_ops(n_lanes: int, nbits: int, window: int = 4) -> dict:
    """Analytic op count of the fixed-base table MSM (msm/fixed.py)."""
    return {"dbl": 0, "add": n_lanes * (-(-nbits // window))}


def sol_report(curve, ops: dict, seconds: float) -> dict:
    """point_ops/s and % of the chip's speed of light for a measured phase.

    ops: {"add": N, "dbl": N} analytic counts for the work performed."""
    fm = field_mul_int32_muls(curve)
    pm = POINT_MULS[getattr(curve, "COORDS", 3)]
    total_ops = ops.get("add", 0) + ops.get("dbl", 0)
    total_muls = (ops.get("add", 0) * pm["add"]
                  + ops.get("dbl", 0) * pm["dbl"]) * fm
    sol_s = total_muls / VPU_INT32_MULS_PER_S
    return {
        "point_ops": int(total_ops),
        "point_ops_per_s": round(total_ops / seconds, 1) if seconds else None,
        "int32_muls": int(total_muls),
        "sol_s": round(sol_s, 6),
        "sol_pct": round(100.0 * sol_s / seconds, 2) if seconds else None,
    }


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

    def msm_ops(self, n_points: int, nbits: int, engine: str = "ladder"):
        """Analytic point-op count of one MSM dispatch. Called from the
        Python-level msm()/fixed_msm()/msm_pippenger() wrappers — inside a
        fused jit program this fires at TRACE time (once per compiled
        program), so the counters report program SHAPES; bench.py computes
        its per-iteration analytic counts from the workload directly."""
        if engine == "pippenger":
            ops = pippenger_point_ops(n_points, nbits)
        elif engine == "fixed":
            ops = fixed_point_ops(n_points, nbits)
        else:
            ops = ladder_point_ops(n_points, nbits)
        self.count("msm.point_ops", ops["add"] + ops["dbl"])
        self.count(f"msm.calls.{engine}", 1)

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
