#!/usr/bin/env python
"""BASELINE.json measurement configs 1-5 on the current backend.

  1. single 32-bit proof, m=1, edwards25519 (the curve25519/Ristretto slot)
  2. aggregated n=32, m=16, edwards25519
  3. aggregated n=64, m=64, secp256k1
  4. aggregated n=64, m=256, bls12_381 G1
  5. batch of K aggregated proofs as one (optionally sharded) mega-MSM

Each config prints one JSON line: prove_s, verify_s, proof_bytes. Heavy
configs (3, 4) compile one program per (curve, mn) on first run — gate with
BPP_MATRIX_CONFIGS, e.g. BPP_MATRIX_CONFIGS=1,2,5. Config 5 uses the batch
pipeline at K=BPP_BENCH_BATCH (default 16; 1024 is the BASELINE target on a
multi-host pod — one chip validates the shape at smaller K).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np  # noqa: E402

MODE = os.environ.get("BPP_BENCH_MODE", "deterministic")


def _mk_transcript(curve, m):
    from bulletproofsplus_tpu import DeterministicTranscript, ShaTranscript

    if MODE == "deterministic":
        return DeterministicTranscript(m)
    if MODE == "merlin":
        from bulletproofsplus_tpu.merlin import MerlinBppTranscript

        return MerlinBppTranscript(m)
    if MODE == "fs256":
        from bulletproofsplus_tpu import Fs256Transcript

        return Fs256Transcript(m)
    return ShaTranscript(m)


def _mk_rng(curve, m):
    from bulletproofsplus_tpu import DeterministicRng, SystemRng

    if MODE == "deterministic":
        return DeterministicRng(m)
    return SystemRng(curve.fn.p)


CONFIGS = {
    "1": ("edwards25519", 32, 1),
    "2": ("edwards25519", 32, 16),
    "3": ("secp256k1", 64, 64),
    "4": ("bls12_381", 64, 256),
}
SELECT = os.environ.get("BPP_MATRIX_CONFIGS", "1,2,3,4,5").split(",")
K = int(os.environ.get("BPP_BENCH_BATCH", "16"))
REPS = int(os.environ.get("BPP_BENCH_REPS", "3"))


def run_config(tag, curve_name, n, m):
    from bulletproofsplus_tpu import (
        PublicKey, RangeProver, curve_ops, prove, verify)
    from bulletproofsplus_tpu.serialize import proof_to_bytes

    curve = curve_ops(curve_name)
    pk = PublicKey.new(curve, n * m)
    p = RangeProver()
    for i in range(m):
        p.commit(pk, (3 * i + 2) % (1 << n), 2 * i + 3)
    def prove_once():
        return prove(curve, pk, n, p, transcript=_mk_transcript(curve, m),
                     rng=_mk_rng(curve, m))

    def verify_once(pf):
        verify(curve, pf, pk, n, p.commitment_vec,
               transcript=_mk_transcript(curve, m))

    proof = prove_once()  # warmup
    np.asarray(proof.proof.r_prime)
    pt = []
    for _ in range(REPS):
        t0 = time.time()
        proof = prove_once()
        np.asarray(proof.proof.r_prime)
        np.asarray(proof.proof.L_vec)
        pt.append(time.time() - t0)
    verify_once(proof)  # warmup
    vt = []
    for _ in range(REPS):
        t0 = time.time()
        verify_once(proof)
        vt.append(time.time() - t0)
    print(json.dumps({
        "config": tag, "curve": curve_name, "n": n, "m": m, "mode": MODE,
        "prove_s": round(min(pt), 4), "verify_s": round(min(vt), 4),
        "proof_bytes": len(proof_to_bytes(curve, proof)),
    }), flush=True)


def run_batch():
    from bulletproofsplus_tpu import (
        PublicKey, RangeProver, curve_ops, stack_commitments)
    from bulletproofsplus_tpu.protocol import batch_prove, batch_verify

    curve = curve_ops("edwards25519")
    n, m = 64, 16
    pk = PublicKey.new(curve, n * m)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    commits = stack_commitments(
        curve, [p.commitment_vec for p in provers])
    def tr_list():
        return [_mk_transcript(curve, m) for _ in range(K)]

    def rng_list():
        return [_mk_rng(curve, m) for _ in range(K)]

    pb = batch_prove(curve, pk, n, provers,
                     transcripts=tr_list(), rngs=rng_list())  # warmup
    np.asarray(pb.r_prime)
    pt = []
    for _ in range(REPS):
        t0 = time.time()
        pb = batch_prove(curve, pk, n, provers,
                         transcripts=tr_list(), rngs=rng_list())
        np.asarray(pb.r_prime)
        np.asarray(pb.L_vec)
        pt.append(time.time() - t0)
    batch_verify(curve, pk, n, pb, commits, transcripts=tr_list())  # warmup
    vt = []
    for _ in range(REPS):
        t0 = time.time()
        batch_verify(curve, pk, n, pb, commits, transcripts=tr_list())
        vt.append(time.time() - t0)
    print(json.dumps({
        "config": "5", "curve": "edwards25519", "n": n, "m": m, "K": K,
        "mode": MODE,
        "batch_prove_s_per_proof": round(min(pt) / K, 4),
        "batch_verify_s_per_proof": round(min(vt) / K, 5),
    }), flush=True)


def main():
    for tag in SELECT:
        tag = tag.strip()
        if tag == "5":
            run_batch()
        elif tag in CONFIGS:
            run_config(tag, *CONFIGS[tag])


if __name__ == "__main__":
    main()
