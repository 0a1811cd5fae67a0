#!/usr/bin/env python
"""Hardware validation for the K-batched-native whole-fold prover program.

Round-3 context: the driver bench failed (rc=1, VerificationError) with
BPP_PROVER_KBATCHED=1; the program has been gated off since, with its only
coverage the CPU differential test (tests/test_batchprove.py). This script
settles the question on the real chip: run batch_prove twice in one process
(vmapped unrolled program vs the K-batched-native program), require
byte-identical serialized proofs for every member, END-TO-END batch_verify
the K-batched ProofBatch (accept) and a tampered copy (reject), and report
the speedup. Commit the JSON as evidence.

Usage: python scripts/validate_prover_kbatched.py [K] [n] [m] [curve]
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
import numpy as np  # noqa: E402

from bulletproofsplus_tpu import (  # noqa: E402
    DeterministicRng,
    DeterministicTranscript,
    PublicKey,
    RangeProver,
    VerificationError,
    curve_ops,
)
from bulletproofsplus_tpu.protocol import (  # noqa: E402
    batch_prove,
    batch_verify,
    stack_commitments,
)
from bulletproofsplus_tpu.serialize import proof_to_bytes  # noqa: E402


def run(curve, pk, n, provers, reps=3):
    m = len(provers[0].v_vec)
    pb = batch_prove(
        curve, pk, n, provers,
        transcripts=[DeterministicTranscript(m) for _ in provers],
        rngs=[DeterministicRng(m) for _ in provers])
    np.asarray(pb.r_prime)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        pb = batch_prove(
            curve, pk, n, provers,
            transcripts=[DeterministicTranscript(m) for _ in provers],
            rngs=[DeterministicRng(m) for _ in provers])
        np.asarray(pb.r_prime)
        np.asarray(pb.L_vec)
        best = min(best, time.time() - t0)
    return pb, best


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cname = sys.argv[4] if len(sys.argv) > 4 else "edwards25519"
    curve = curve_ops(cname)
    pk = PublicKey.new(curve, n * m)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)

    os.environ["BPP_PROVER_KBATCHED"] = "0"
    pb_ref, t_ref = run(curve, pk, n, provers)
    os.environ["BPP_PROVER_KBATCHED"] = "1"
    t0 = time.time()
    pb_kb, t_kb = run(curve, pk, n, provers)
    cold_kb = time.time() - t0

    byte_eq = all(
        proof_to_bytes(curve, pb_kb[i]) == proof_to_bytes(curve, pb_ref[i])
        for i in range(K))

    commits = stack_commitments(
        curve, [p.commitment_vec for p in provers])
    dt = lambda: [DeterministicTranscript(m) for _ in range(K)]  # noqa: E731
    try:
        batch_verify(curve, pk, n, pb_kb, commits, transcripts=dt())
        accept = True
    except VerificationError:
        accept = False
    bad = dataclasses.replace(
        pb_kb, r_prime=pb_kb.r_prime.at[0].set(
            jnp.asarray(curve.fn.encode(31337))))
    try:
        batch_verify(curve, pk, n, bad, commits, transcripts=dt())
        reject = False
    except VerificationError:
        reject = True

    import jax

    out = {
        "curve": cname, "n": n, "m": m, "K": K,
        "backend": jax.default_backend(),
        "byte_exact_vs_vmapped": bool(byte_eq),
        "batch_verify_accepts": accept,
        "tampered_rejects": reject,
        "vmapped_s": round(t_ref, 3),
        "kbatched_s": round(t_kb, 3),
        "kbatched_cold_s": round(cold_kb, 1),
        "speedup": round(t_ref / t_kb, 2) if t_kb else None,
        "all_ok": bool(byte_eq and accept and reject),
    }
    print(json.dumps(out))
    if not out["all_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
