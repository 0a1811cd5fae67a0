#!/usr/bin/env python
"""Stage-by-stage timing of batch verification on the real chip.

Breaks the K-proof batch-verify wall time into: host transcript replay,
host->device encode/transfer, the vmapped exponent-vector program, the RLC
merge, the variable-lane MSM, the fixed-base MSM, and the fused
one-program path — each with a forced device->host fetch (the axon remote
backend's block_until_ready returns before execution, so naive timings lie).

Usage: python scripts/profile_batch_verify.py [K] [n] [m] [curve]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from bulletproofsplus_tpu import PublicKey, RangeProver, curve_ops  # noqa: E402
from bulletproofsplus_tpu.msm import msm  # noqa: E402
from bulletproofsplus_tpu.msm.fixed import fixed_msm  # noqa: E402
from bulletproofsplus_tpu.protocol import batch_prove, batch_verify  # noqa: E402
from bulletproofsplus_tpu.protocol.batch import (  # noqa: E402
    _batch_verify_fused,
)
from bulletproofsplus_tpu.protocol.range import (  # noqa: E402
    replay_batch,
    stack_commitments,
    verification_inputs_batch,
)


def t(fn, reps=3):
    fn()  # warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def fetch(x):
    np.asarray(x)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cname = sys.argv[4] if len(sys.argv) > 4 else "edwards25519"
    curve = curve_ops(cname)
    fn = curve.fn
    mn = n * m

    pk = PublicKey.new(curve, mn)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    commits = stack_commitments(
        curve, [p.commitment_vec for p in provers])

    t0 = time.time()
    pbatch = batch_prove(curve, pk, n, provers)
    fetch(pbatch.r_prime)
    print(f"batch_prove (cold+compile): {time.time() - t0:.3f}s")
    tp = t(lambda: (fetch(batch_prove(curve, pk, n, provers).r_prime)))
    print(f"batch_prove warm: {tp:.3f}s = {tp / K * 1e3:.2f} ms/proof")

    transcripts = [None] * K

    # stage 1: host replay
    tr = t(lambda: replay_batch(
        curve, pbatch, commits, n, m, transcripts))
    print(f"host replay: {tr * 1e3:.1f} ms")

    # stage 2: vmapped exponent program (includes encode + transfer)
    def vinputs():
        inp = verification_inputs_batch(
            curve, pbatch, pk, n, commits, transcripts)
        fetch(inp.g_exp)
        return inp

    tv = t(vinputs)
    print(f"exponent vectors (vmapped, incl replay): {tv * 1e3:.1f} ms")
    inp = verification_inputs_batch(
        curve, pbatch, pk, n, commits, transcripts)

    # stage 3: RLC merge (eager)
    W = jnp.asarray(fn.encode([0x123456789ABCDEF0 + i for i in range(K)]))
    Wg = W[:, None, :]

    def merge():
        G_exp = fn.sum(fn.mul(inp.G_exp, Wg), axis=0)
        H_exp = fn.sum(fn.mul(inp.H_exp, Wg), axis=0)
        g_exp = fn.sum(fn.mul(inp.g_exp, W), axis=0)
        h_exp = fn.sum(fn.mul(inp.h_exp, W), axis=0)
        uniq_s = fn.mul(inp.unique_scalars, Wg)
        fetch(g_exp)
        fetch(h_exp)
        return G_exp, H_exp, uniq_s

    tm = t(merge)
    print(f"RLC merge (eager): {tm * 1e3:.1f} ms")
    G_exp, H_exp, uniq_s = merge()

    # stage 4: variable-lane MSM
    uniq_sf = uniq_s.reshape(-1, fn.L)
    uniq_p = inp.unique_points.reshape(-1, *inp.unique_points.shape[-2:])
    var_s = jnp.concatenate([uniq_sf], axis=0)

    def var_msm():
        fetch(msm(curve, fn.from_mont(var_s), uniq_p))

    print(f"variable-lane MSM ({uniq_p.shape[0]} lanes): "
          f"{t(var_msm) * 1e3:.1f} ms")

    # stage 5: fixed-base MSM over 2mn generator lanes
    table = pk.fixed_tables(mn)
    fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)

    def fb():
        fetch(fixed_msm(curve, fn.from_mont(fixed_s), table))

    print(f"fixed-base MSM ({2 * mn} lanes): {t(fb) * 1e3:.1f} ms")

    # end-to-end: old eager path vs fused one-program path
    os.environ["BPP_FUSE_PROVER"] = "0"
    te = t(lambda: batch_verify(curve, pk, n, pbatch, commits))
    print(f"batch_verify end-to-end (eager path): {te * 1e3:.1f} ms "
          f"= {K / te:.0f} verify/s")
    os.environ.pop("BPP_FUSE_PROVER")

    draw = iter(range(10**6, 10**7)).__next__
    tf = t(lambda: _batch_verify_fused(
        curve, pk, n, m, pbatch, commits, transcripts, draw))
    print(f"batch_verify end-to-end (fused): {tf * 1e3:.1f} ms "
          f"= {K / tf:.0f} verify/s")


if __name__ == "__main__":
    main()
