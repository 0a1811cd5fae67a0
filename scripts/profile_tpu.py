#!/usr/bin/env python
"""Stepwise timing of the proof pipeline to locate compile/run hotspots.

Usage: python scripts/profile_tpu.py [n] [m] [curve]
Prints wall time for: setup, commit, prove (with per-round breakdown via
BPP_TRACE), verify-inputs, verify-MSM. Run twice to separate compile from
steady-state cost.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
curve_name = sys.argv[3] if len(sys.argv) > 3 else "edwards25519"

import jax

print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)

from bulletproofsplus_tpu import PublicKey, RangeProver, curve_ops, prove, verify
from bulletproofsplus_tpu.protocol import range as range_mod

curve = curve_ops(curve_name)

t0 = time.time()
pk = PublicKey.new(curve, n * m)
pk.g.block_until_ready()
print(f"setup: {time.time()-t0:.2f}s", flush=True)

t0 = time.time()
prover = RangeProver()
for i in range(m):
    prover.commit(pk, (3 * i + 2) % (1 << n), 2 * i + 3)
prover.commitment_vec[-1].block_until_ready()
print(f"commit: {time.time()-t0:.2f}s", flush=True)

for rep in range(2):
    t0 = time.time()
    proof = prove(curve, pk, n, prover)
    proof.proof.r_prime.block_until_ready()
    print(f"prove[{rep}]: {time.time()-t0:.2f}s", flush=True)

for rep in range(2):
    t0 = time.time()
    inputs = range_mod.verification_inputs(curve, proof, pk, n, prover.commitment_vec)
    inputs.G_exp.block_until_ready()
    t1 = time.time()
    print(f"verify-inputs[{rep}]: {t1-t0:.2f}s", flush=True)
    scalars, points = inputs.msm_inputs(pk)
    scalars.block_until_ready()
    t2 = time.time()
    print(f"verify-msm-prep[{rep}]: {t2-t1:.2f}s", flush=True)
    from bulletproofsplus_tpu.msm import msm

    out = msm(curve, scalars, points)
    out.block_until_ready()
    t3 = time.time()
    print(f"verify-msm[{rep}]: {t3-t2:.2f}s  identity={bool(curve.is_identity(out))}",
          flush=True)
