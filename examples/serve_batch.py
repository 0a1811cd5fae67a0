#!/usr/bin/env python
"""Batched serving demo: K statements → ONE vmapped prover pipeline →
ONE random-linear-combination verification MSM.

This is the TPU-idiomatic shape (docs/DESIGN.md §6): homogeneous batches,
pre-stacked tensors end-to-end, per-proof device-dispatch cost O(1).

Run:  python examples/serve_batch.py [--k 16] [--n 64] [--m 16]
      [--curve edwards25519] [--mesh-dp 2]   (dp>1 splits the batch into
      dp group MSMs over a ("dp","tp") device mesh)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import numpy as np  # noqa: E402

from bulletproofsplus_tpu import (  # noqa: E402
    PublicKey,
    RangeProver,
    batch_prove,
    batch_verify,
    curve_ops,
    stack_commitments,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--curve", default="edwards25519")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--mesh-dp", type=int, default=0,
                    help="dp>0: shard verification over a (dp, tp) mesh")
    args = ap.parse_args()

    curve = curve_ops(args.curve)
    n, m, K = args.n, args.m, args.k

    t0 = time.time()
    pk = PublicKey.new(curve, n * m)
    print(f"setup: {time.time()-t0:.2f}s ({2*n*m+2} generators)")

    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    commits = stack_commitments(curve, [p.commitment_vec for p in provers])

    t0 = time.time()
    pbatch = batch_prove(curve, pk, n, provers)
    np.asarray(pbatch.r_prime)  # force execution
    dt = time.time() - t0
    print(f"batch_prove:  {dt:.2f}s total, {dt/K*1e3:.0f} ms/proof "
          f"(K={K}, includes first-run compile)")

    mesh = None
    if args.mesh_dp > 0:
        import jax

        from bulletproofsplus_tpu.parallel import default_mesh

        mesh = default_mesh(len(jax.devices()), dp=args.mesh_dp)
        print(f"mesh: {dict(mesh.shape)}")

    t0 = time.time()
    batch_verify(curve, pk, n, pbatch, commits, mesh=mesh)
    dt = time.time() - t0
    print(f"batch_verify: {dt:.3f}s total, {dt/K*1e3:.1f} ms/proof — ACCEPT")


if __name__ == "__main__":
    main()
