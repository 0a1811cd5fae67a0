#!/usr/bin/env python
"""Scaling-efficiency report: sharded batch verification at 1..N devices.

BASELINE.md asks for scaling efficiency of aggregated range-proof
verification 1 chip → 1 host → N hosts (target ≥80% linear). This harness
measures the same program shape at each mesh width and reports efficiency
vs linear. On a machine with one real chip, run it on the virtual CPU mesh
(throughput numbers are then host-bound and only the SHAPE is validated):

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python scripts/bench_scaling.py

On a real multi-chip slice it measures true ICI scaling. Prints one JSON
line per mesh width plus a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    if "xla_cpu_max_isa" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_cpu_max_isa=AVX2"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from bulletproofsplus_tpu import (  # noqa: E402
    PublicKey,
    RangeProver,
    curve_ops,
    prove,
    stack_commitments,
)
from bulletproofsplus_tpu.parallel import default_mesh  # noqa: E402
from bulletproofsplus_tpu.protocol import batch_verify  # noqa: E402

CURVE = os.environ.get("BPP_BENCH_CURVE", "edwards25519")
N_BITS = int(os.environ.get("BPP_BENCH_N", "8"))
M_AGG = int(os.environ.get("BPP_BENCH_M", "2"))
K = int(os.environ.get("BPP_BENCH_BATCH", "4"))
REPS = int(os.environ.get("BPP_BENCH_REPS", "3"))


def main():
    curve = curve_ops(CURVE)
    n, m = N_BITS, M_AGG
    pk = PublicKey.new(curve, n * m)
    proofs, commits_l = [], []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        proofs.append(prove(curve, pk, n, p))
        commits_l.append(p.commitment_vec)
    commits = stack_commitments(curve, commits_l)

    ndevs = [d for d in (1, 2, 4, 8) if d <= len(jax.devices())]
    results = {}
    for nd in ndevs:
        mesh = default_mesh(nd, dp=1) if nd > 1 else None
        batch_verify(curve, pk, n, proofs, commits, mesh=mesh)  # warmup
        times = []
        for _ in range(REPS):
            t0 = time.time()
            batch_verify(curve, pk, n, proofs, commits, mesh=mesh)
            times.append(time.time() - t0)
        results[nd] = K / min(times)
        print(json.dumps({
            "metric": f"batch-verify/s ({CURVE}, n={n}, m={m}, K={K})",
            "devices": nd,
            "value": round(results[nd], 3),
            "unit": "verify/s",
        }))

    base = results[ndevs[0]]
    eff = {nd: results[nd] / (base * nd / ndevs[0]) for nd in ndevs}
    print(json.dumps({
        "metric": "scaling efficiency vs linear",
        "efficiency": {str(nd): round(e, 3) for nd, e in eff.items()},
        "backend": jax.default_backend(),
        "note": ("virtual CPU mesh: shape-validation only"
                 if jax.default_backend() == "cpu" else "real devices"),
    }))


if __name__ == "__main__":
    main()
