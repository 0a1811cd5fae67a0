"""`python -m bulletproofsplus_tpu` — the reference's demo binary.

The reference crate ships `src/main.rs:6-57`: build a 128-generator key,
commit (v=2, gamma=3) and (v=5, gamma=7), prove a 64-bit aggregated range
proof, verify, and print timings. This entry point runs the same workload
inline (see examples/demo.py for the commented walk-through version).
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    from .utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from . import (
        DeterministicRng,
        DeterministicTranscript,
        PublicKey,
        RangeProver,
        curve_ops,
        prove,
        verify,
    )

    ap = argparse.ArgumentParser(prog="bulletproofsplus_tpu")
    ap.add_argument("--curve", default="edwards25519",
                    choices=["edwards25519", "secp256k1", "bls12_381"])
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--reference", action="store_true",
                    help="reference-constant challenges/blinds "
                         "(bit-exact parity mode; default is the sound "
                         "Fiat-Shamir transcript + random blinds)")
    args = ap.parse_args(argv)

    curve = curve_ops(args.curve)
    n, m = args.n, 2
    mode = ("deterministic (reference parity)" if args.reference
            else "secure (default)")
    print(f"curve={args.curve} n={n} m={m} mode={mode}")

    t0 = time.time()
    pk = PublicKey.new(curve, n * m)                      # main.rs:14
    print(f"setup: {time.time() - t0:.2f}s ({2 * n * m + 2} generators)")

    prover = RangeProver()
    prover.commit(pk, 2, 3)                               # main.rs:18-21
    prover.commit(pk, 5, 7)                               # main.rs:22-25

    kw = ({"transcript": DeterministicTranscript(m), "rng":
           DeterministicRng(m)} if args.reference else {})
    t0 = time.time()
    proof = prove(curve, pk, n, prover, **kw)             # main.rs:29
    print(f"prove: {time.time() - t0:.2f}s")

    vkw = ({"transcript": DeterministicTranscript(m)}
           if args.reference else {})
    t0 = time.time()
    verify(curve, proof, pk, n, prover.commitment_vec, **vkw)  # main.rs:49
    print(f"verify: {time.time() - t0:.2f}s")
    print("ok")                                           # main.rs:56


if __name__ == "__main__":
    main()
