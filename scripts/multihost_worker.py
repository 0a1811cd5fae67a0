#!/usr/bin/env python
"""One process of a multi-host batch-verification run.

Joins the jax.distributed runtime, builds a ("dp", "tp") GLOBAL mesh with
dp rows spanning processes (the DCN axis) and tp within each process (the
ICI axis on real pods), and runs the production `batch_verify` DP x TP path
on real proofs — accept on valid proofs, reject on a tampered batch.

This is both the multi-host entry point users run per host
(SURVEY.md §5 comm-backend row; BASELINE config 5's "across N>=2 hosts")
and the worker of the committed 2-process CPU simulation
(tests/test_multihost.py). On a real pod, run one copy per host with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and
without --cpu-sim.

Usage (simulation): multihost_worker.py --coord localhost:PORT --nproc 2 \
    --pid I --cpu-sim [--devices-per-proc 4]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", default=None)
    ap.add_argument("--nproc", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--cpu-sim", action="store_true")
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--K", type=int, default=2)
    args = ap.parse_args()

    if args.cpu_sim:
        flags = os.environ.get("XLA_FLAGS", "")
        flags += (f" --xla_force_host_platform_device_count="
                  f"{args.devices_per_proc}")
        if "xla_cpu_max_isa" not in flags:
            flags += " --xla_cpu_max_isa=AVX2"
        os.environ["XLA_FLAGS"] = flags.strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax  # noqa: F401

    # distributed init must precede ANY backend-initializing JAX call —
    # including setup_compilation_cache (it probes jax.default_backend())
    from bulletproofsplus_tpu.parallel import init_distributed

    init_distributed(args.coord, args.nproc, args.pid)

    from bulletproofsplus_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bulletproofsplus_tpu import (
        DeterministicRng,
        DeterministicTranscript,
        PublicKey,
        RangeProver,
        VerificationError,
        curve_ops,
    )
    from bulletproofsplus_tpu.parallel import global_mesh, warmup_collectives
    from bulletproofsplus_tpu.protocol import batch_prove, batch_verify
    procs = jax.process_count()
    print(f"[proc {jax.process_index()}] joined: {procs} processes, "
          f"{len(jax.devices())} global / {len(jax.local_devices())} local "
          f"devices", flush=True)

    mesh = global_mesh(dp=procs)  # dp spans hosts, tp local
    # create the cross-process communicator while processes are in lockstep
    # (lazily creating it after minutes of staggered compiles can miss the
    # 30 s rendezvous window under load)
    warmup_collectives(mesh)
    print(f"[proc {jax.process_index()}] collectives warmed", flush=True)
    n, m, K = args.n, args.m, args.K
    assert K % procs == 0, "K must split evenly over dp rows"

    curve = curve_ops("edwards25519")
    pk = PublicKey.new(curve, n * m)

    # identical witnesses + deterministic transcripts on every process →
    # replicated host-side inputs (what _to_global requires)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    dt = lambda: [DeterministicTranscript(m) for _ in range(K)]  # noqa: E731
    dr = [DeterministicRng(m) for _ in range(K)]
    batch = batch_prove(curve, pk, n, provers, transcripts=dt(), rngs=dr)
    commits = jnp.stack([jnp.stack(p.commitment_vec) for p in provers])

    batch_verify(curve, pk, n, batch, commits, transcripts=dt(), mesh=mesh)
    print(f"[proc {jax.process_index()}] accept: ok", flush=True)

    import dataclasses

    bad = dataclasses.replace(
        batch, r_prime=batch.r_prime.at[0].set(
            jnp.asarray(curve.fn.encode(31337))))
    try:
        batch_verify(curve, pk, n, bad, commits, transcripts=dt(), mesh=mesh)
        print("TAMPERED BATCH ACCEPTED", flush=True)
        sys.exit(1)
    except VerificationError:
        print(f"[proc {jax.process_index()}] reject: ok", flush=True)

    print(f"MULTIHOST OK proc={jax.process_index()}", flush=True)


if __name__ == "__main__":
    main()
