#!/usr/bin/env python
"""Hardware validation for the Pallas-ladder prover path.

Runs the batch prover twice on the real chip — BPP_PROVER_PALLAS=0 (XLA
scan ladder) and =1 (whole-ladder Pallas kernel inside the unrolled fold
program) — and requires scalars byte-exact plus points affine-equal
(identical serialized proofs; raw limb tensors may differ by a projective
scale factor from different MSM lane padding), then END-TO-END VERIFIES the
Pallas-path ProofBatch with batch_verify — which consumes the raw limb
tensors (extended-Edwards T included), so an internally inconsistent point
that happens to be affine-equal still fails. Reports the speedup. Used to
justify enabling the Pallas prover by default on TPU.

Usage: python scripts/validate_prover_pallas.py [K] [n] [m]
"""
from __future__ import annotations

import os
import sys
import time

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from bulletproofsplus_tpu import (  # noqa: E402
    DeterministicRng,
    DeterministicTranscript,
    PublicKey,
    RangeProver,
    curve_ops,
)
from bulletproofsplus_tpu.protocol import batch_prove  # noqa: E402


POINT_FIELDS = ("A", "L_vec", "R_vec", "A_wip", "B")
SCALAR_FIELDS = ("r_prime", "s_prime", "d_prime")


def run(curve, pk, n, provers):
    # deterministic mode: this script validates the KNOWN-CHALLENGE whole-
    # fold programs (the library default is now the secure sha transcript,
    # which takes the interactive per-round path instead)
    m = len(provers[0].v_vec)
    t0 = time.time()
    pb = batch_prove(
        curve, pk, n, provers,
        transcripts=[DeterministicTranscript(m) for _ in provers],
        rngs=[DeterministicRng(m) for _ in provers])
    out = {f: np.asarray(getattr(pb, f))
           for f in POINT_FIELDS + SCALAR_FIELDS}
    return pb, out, time.time() - t0


def points_equal(curve, a, b) -> bool:
    """Affine equality of (..., C, L) limb point tensors. The two engines
    pad MSM lanes differently, and under the complete formulas adding an
    identity pad point RESCALES the projective representative (e.g.
    Edwards P + 0 = (4XZ, 4YZ, 4Z^2, 4XY)) — so raw limb tensors differ
    while the points (and their serialized/compressed forms) are equal."""
    a = a.reshape(-1, *a.shape[-2:])
    b = b.reshape(-1, *b.shape[-2:])
    return all(
        curve.decode_point(a[i]) == curve.decode_point(b[i])
        for i in range(a.shape[0])
    )


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    curve = curve_ops(sys.argv[4] if len(sys.argv) > 4 else "edwards25519")
    pk = PublicKey.new(curve, n * m)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)

    os.environ["BPP_PROVER_PALLAS"] = "0"
    _, base, _ = run(curve, pk, n, provers)  # warm the baseline compile
    _, base, t_xla = run(curve, pk, n, provers)
    print(f"XLA scan ladder: {t_xla:.3f}s = {t_xla / K * 1e3:.1f} ms/proof")

    os.environ["BPP_PROVER_PALLAS"] = "1"
    pb, pal, _ = run(curve, pk, n, provers)  # warm the Pallas compile
    pb, pal, t_pal = run(curve, pk, n, provers)
    print(f"Pallas ladder:   {t_pal:.3f}s = {t_pal / K * 1e3:.1f} ms/proof "
          f"({t_xla / t_pal:.2f}x)")

    from bulletproofsplus_tpu.protocol import batch_verify

    commits = jnp.stack([jnp.stack(p.commitment_vec) for p in provers])

    def check(tag, ref, got, got_pb) -> bool:
        ok = True
        for f in SCALAR_FIELDS:
            if not np.array_equal(ref[f], got[f]):
                print(f"  [{tag}] scalar mismatch in", f)
                ok = False
        for f in POINT_FIELDS:
            if not points_equal(curve, ref[f], got[f]):
                print(f"  [{tag}] point mismatch in", f)
                ok = False
        print(f"[{tag}] proofs equal (scalars byte-exact, points "
              f"affine-equal):", ok)
        # end-to-end: verify through the production verifier, which
        # consumes RAW limb tensors (T coordinate included) — catches
        # internally inconsistent points that are affine-equal
        try:
            batch_verify(
                curve, pk, n, got_pb, commits,
                transcripts=[DeterministicTranscript(m) for _ in provers])
            print(f"[{tag}] batch_verify: ok")
        except Exception as exc:  # noqa: BLE001
            print(f"[{tag}] batch_verify FAILED:", exc)
            ok = False
        return ok

    ok = check("pallas-vmap", base, pal, pb)

    # phase 3: the K-batched-native program (opt-in BPP_PROVER_KBATCHED=1;
    # flattens K into every kernel's lane axis instead of vmapping) against
    # the vmapped Pallas baseline — this is the validation gate for making
    # it the default
    os.environ["BPP_PROVER_KBATCHED"] = "1"
    try:
        pbk, kb, _ = run(curve, pk, n, provers)  # warm
        pbk, kb, t_kb = run(curve, pk, n, provers)
        print(f"K-batched:       {t_kb:.3f}s = {t_kb / K * 1e3:.1f} ms/proof "
              f"({t_pal / t_kb:.2f}x vs pallas-vmap)")
        ok = check("kbatched", pal, kb, pbk) and ok
    except Exception as exc:  # noqa: BLE001
        print("[kbatched] prove FAILED:", exc)
        ok = False
    finally:
        del os.environ["BPP_PROVER_KBATCHED"]
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
