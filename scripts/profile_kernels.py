#!/usr/bin/env python
"""Microbenchmarks of the hot kernels on the real chip.

Times (with forced device->host fetches — the axon remote backend's
block_until_ready returns before execution):
  - joint whole-ladder MSM at J in {2, 4, 8} on the batch-verify
    variable-lane shape;
  - the fixed-base lookup-accumulate kernel on the 2mn generator shape;
  - the fused Montgomery multiply kernel's raw throughput;
  - the vmapped exponent-vector program (the fused verify's big
    field-only stage).

Usage: python scripts/profile_kernels.py [K] [n] [m]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bulletproofsplus_tpu import PublicKey, curve_ops  # noqa: E402


def t(fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    curve = curve_ops("edwards25519")
    fn = curve.fn
    mn = n * m
    logn = mn.bit_length() - 1
    nbits = fn.order_bits

    rng = np.random.default_rng(7)

    def rand_scalars(N):
        return jnp.asarray(
            rng.integers(0, 1 << 12, size=(N, fn.L), dtype=np.int32))

    pk = PublicKey.new(curve, mn)
    var_lanes = K * (2 * logn + m + 3) + 2

    # 1. joint ladder J sweep on the var-lane shape
    from bulletproofsplus_tpu.curves.pallas_curve import (
        joint_ladder_msm_grouped,
    )
    from bulletproofsplus_tpu.msm.engine import tree_sum

    for J in (2, 4, 8):
        N = -(-var_lanes // J) * J
        pts = jnp.broadcast_to(pk.G_vec[0], (N, *pk.G_vec.shape[-2:]))
        sc = rand_scalars(N)

        def run(J=J, sc=sc, pts=pts):
            out = tree_sum(curve, joint_ladder_msm_grouped(
                curve, sc, pts, nbits, J))
            np.asarray(out)

        print(f"joint ladder J={J} N={N}: {t(run) * 1e3:.1f} ms",
              flush=True)

    # 2. fixed-base kernel on the generator shape
    from bulletproofsplus_tpu.msm.fixed import fixed_msm

    table = pk.fixed_tables(mn)
    fsc = rand_scalars(2 * mn)

    def run_fixed():
        np.asarray(fixed_msm(curve, fsc, table))

    print(f"fixed-base MSM 2mn={2 * mn}: {t(run_fixed) * 1e3:.1f} ms",
          flush=True)

    # 3. raw mont_mul throughput
    from bulletproofsplus_tpu.fields.pallas_ops import mont_mul

    for N in (1 << 17, 1 << 20):
        a = rand_scalars(N)
        b = rand_scalars(N)

        def run_mul(a=a, b=b):
            np.asarray(mont_mul(fn, a, b))

        ms = t(run_mul) * 1e3
        print(f"mont_mul N={N}: {ms:.1f} ms "
              f"({N / ms * 1e3 / 1e6:.0f} Mmul/s)", flush=True)

    # 4. the vmapped exponent-vector program alone
    from bulletproofsplus_tpu.protocol.range import (
        _vinputs_multiple_jit_vmap,
    )

    vf = _vinputs_multiple_jit_vmap(curve, n, m)
    ys = jnp.asarray(fn.encode(list(rng.integers(1, 1 << 60, size=K))))
    zs = jnp.asarray(fn.encode(list(rng.integers(1, 1 << 60, size=K))))
    ess = jnp.asarray(fn.encode(
        list(rng.integers(1, 1 << 60, size=K * logn)))).reshape(K, logn, fn.L)
    efs = jnp.asarray(fn.encode(list(rng.integers(1, 1 << 60, size=K))))
    rp = jnp.asarray(fn.encode(list(rng.integers(1, 1 << 60, size=K))))

    def run_vin():
        out = vf(ys, zs, ess, efs, rp, rp, rp)
        np.asarray(out[1])

    print(f"vinputs vmapped K={K}: {t(run_vin) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
