#!/usr/bin/env python
"""End-to-end demo — the reference's main() workload (src/main.rs:6-57):
n = 64-bit range, m = 2 aggregated commitments (v=2, γ=3) and (v=5, γ=7),
prove, verify, and report timings.

Run:  python examples/demo.py [--curve edwards25519|secp256k1|bls12_381]
      [--reference]  (the reference's deterministic challenge/blinding
                      constants — bit-exact parity mode — instead of the
                      default real Fiat-Shamir transcript + random blindings)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from bulletproofsplus_tpu import (  # noqa: E402
    DeterministicRng,
    DeterministicTranscript,
    PublicKey,
    RangeProver,
    curve_ops,
    prove,
    verify,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="edwards25519")
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--reference", action="store_true")
    args = ap.parse_args()

    curve = curve_ops(args.curve)
    n, m = args.n, 2

    print(f"curve={args.curve} n={n} m={m} "
          f"mode={'deterministic (reference parity)' if args.reference else 'secure (default)'}")

    t0 = time.time()
    pk = PublicKey.new(curve, n * m)  # main.rs:14
    print(f"setup: {time.time()-t0:.2f}s ({2*n*m+2} generators)")

    prover = RangeProver()
    prover.commit(pk, 2, 3)  # main.rs:18-21
    prover.commit(pk, 5, 7)  # main.rs:22-25

    tr = DeterministicTranscript(m) if args.reference else None
    rng = DeterministicRng(m) if args.reference else None
    t0 = time.time()
    proof = prove(curve, pk, n, prover, transcript=tr, rng=rng)  # main.rs:29
    print(f"prove: {time.time()-t0:.2f}s "
          f"({2*proof.proof.rounds+3} points + 3 scalars)")

    tr = DeterministicTranscript(m) if args.reference else None
    t0 = time.time()
    verify(curve, proof, pk, n, prover.commitment_vec, transcript=tr)  # main.rs:49
    print(f"verify: {time.time()-t0:.2f}s — OK")


if __name__ == "__main__":
    main()
