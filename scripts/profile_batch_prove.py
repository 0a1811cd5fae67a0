#!/usr/bin/env python
"""Stage-by-stage timing of batch proving on the real chip.

Breaks the K-proof batch-prove wall time into: bit commitment (vmapped A
program), host y/z challenges, the vmapped setup program (a/b
vectors), and the whole-fold program (unrolled rounds; the prover's hot
path — reference wip:79-172), with the Pallas ladder on and off. Each
timing forces a device->host fetch (the axon remote backend's
block_until_ready returns before execution).

Usage: python scripts/profile_batch_prove.py [K] [n] [m] [curve]
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
from bulletproofsplus_tpu.protocol import batch_prove  # noqa: E402
from bulletproofsplus_tpu.protocol.batchprove import (  # noqa: E402
    _bit_commitment_vmap_jit,
    _setup_multiple_vmap_jit,
)
from bulletproofsplus_tpu.protocol.range import _bit_decompose  # noqa: E402
from bulletproofsplus_tpu.protocol.wip import (  # noqa: E402
    _wip_prove_known_vmap_jit_impl,
)
from bulletproofsplus_tpu.transcript import (  # noqa: E402
    DeterministicRng,
    DeterministicTranscript,
)


def t(fn, reps=3):
    fn()  # warmup (compile)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def fetch(x):
    np.asarray(x)


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cname = sys.argv[4] if len(sys.argv) > 4 else "edwards25519"
    # batch_prove routes m == 1 through _setup_single_vmap_jit; this profiler
    # only mirrors the aggregated (m > 1) pipeline — profiling a program the
    # real m=1 path never runs would mislead
    assert m > 1, "profile_batch_prove mirrors the m>1 pipeline; use m >= 2"
    curve = curve_ops(cname)
    fn = curve.fn
    mn = n * m
    logn = mn.bit_length() - 1

    pk = PublicKey.new(curve, mn)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)

    # stage 1: bit commitment A (vmapped MSM over 2mn generator selects)
    rngs = [DeterministicRng(m) for _ in range(K)]
    transcripts = [DeterministicTranscript(m) for _ in range(K)]
    alphas = [r.alpha() for r in rngs]
    bits_np = np.stack([_bit_decompose(p.v_vec, n, m) for p in provers])
    bc = _bit_commitment_vmap_jit(curve, mn)

    def bit_commit():
        A = bc(jnp.asarray(fn.encode_plain(alphas)), jnp.asarray(bits_np),
               pk.G_vec, pk.H_vec, pk.h)
        fetch(A)
        return A

    tb = t(bit_commit)
    print(f"bit commitment A: {tb * 1e3:.1f} ms")
    A_all = bit_commit()

    # stage 2: setup program (a/b vectors + alpha_hat; A_hat is dead
    # prover work and no longer computed)
    yz = [t_.challenge_yz(curve, list(p.commitment_vec), A_all[i])
          for i, (t_, p) in enumerate(zip(transcripts, provers))]
    ys = [y % fn.p for y, _ in yz]
    zs = [z % fn.p for _, z in yz]
    V_all = jnp.stack([jnp.stack(list(p.commitment_vec)) for p in provers])
    gamma_arg = jnp.asarray(
        fn.encode([g for p in provers for g in p.gamma_vec])
    ).reshape(K, m, fn.L)
    setup = _setup_multiple_vmap_jit(curve, n, m)

    def run_setup():
        out = setup(jnp.asarray(fn.encode(ys)), jnp.asarray(fn.encode(zs)),
                    jnp.asarray(bits_np).reshape(K, mn), gamma_arg,
                    jnp.asarray(fn.encode(alphas)), A_all, V_all,
                    pk.G_vec, pk.H_vec, pk.g)
        fetch(out[0])
        return out

    ts_ = t(run_setup)
    print(f"setup (a/b, y-powers): {ts_ * 1e3:.1f} ms")
    a_vec, b_vec, power_of_y, alpha_hat = run_setup()

    # stage 3: the whole-fold program, Pallas ladder off vs on
    dLs = np.empty((K, logn), dtype=object)
    dRs = np.empty((K, logn), dtype=object)
    es = np.empty((K, logn), dtype=object)
    finals, efs = [], []
    for i, (t_, r) in enumerate(zip(transcripts, rngs)):
        for j in range(logn):
            dLs[i, j], dRs[i, j] = r.round_blinds()
            es[i, j] = t_.round_challenge(curve, None, None) % fn.p
        finals.append(r.final_blinds())
        efs.append(t_.final_challenge(curve, None, None) % fn.p)
    rsde = np.array(finals, dtype=object)
    enc2 = lambda arr: jnp.asarray(  # noqa: E731
        fn.encode([int(x) for x in arr.reshape(-1)])
    ).reshape(*arr.shape, fn.L)
    fold_args = (
        a_vec, b_vec, power_of_y, alpha_hat,
        pk.G_vec, pk.H_vec, pk.g, pk.h,
        enc2(es), enc2(dLs), enc2(dRs),
        enc2(rsde[:, 0]), enc2(rsde[:, 1]), enc2(rsde[:, 2]),
        enc2(rsde[:, 3]), jnp.asarray(fn.encode(efs)),
    )
    for pallas in (False, True):
        fold = _wip_prove_known_vmap_jit_impl(curve, mn, False, pallas)

        def run_fold():
            out = fold(*fold_args)
            fetch(out[4])

        tf = t(run_fold)
        label = "pallas" if pallas else "xla"
        print(f"whole-fold ({label}): {tf * 1e3:.1f} ms "
              f"= {tf / K * 1e3:.1f} ms/proof")

    # end to end
    te = t(lambda: fetch(batch_prove(curve, pk, n, provers).r_prime))
    print(f"batch_prove end-to-end: {te * 1e3:.1f} ms "
          f"= {te / K * 1e3:.1f} ms/proof")


if __name__ == "__main__":
    main()
