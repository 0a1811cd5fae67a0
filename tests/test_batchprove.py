"""Batch prover (vmapped pipeline) differential tests.

batch_prove must produce byte-identical proofs to K sequential prove()
calls under the same (transcript, rng), in both transcript regimes:
known-ahead challenges (deterministic replay → whole-fold scan program)
and interactive Fiat-Shamir (lockstep per-round programs). Its ProofBatch
output feeds batch_verify with zero re-stacking.
"""
import dataclasses

import jax.numpy as jnp
import pytest

from bulletproofsplus_tpu import (
    PublicKey,
    RangeProver,
    VerificationError,
    curve_ops,
    prove,
)
from bulletproofsplus_tpu.protocol import (
    ProofBatch,
    batch_prove,
    batch_verify,
    stack_commitments,
)
from bulletproofsplus_tpu.transcript import (
    DeterministicRng,
    DeterministicTranscript,
    ShaTranscript,
)


def _provers(pk, n, m, K):
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    return provers


def _assert_same(curve, got, want):
    g, w = got.to_golden(curve), want.to_golden(curve)
    assert g.A == w.A
    assert g.proof.L_vec == w.proof.L_vec
    assert g.proof.R_vec == w.proof.R_vec
    assert g.proof.A == w.proof.A
    assert g.proof.B == w.proof.B
    assert (g.proof.r_prime, g.proof.s_prime, g.proof.d_prime) == (
        w.proof.r_prime, w.proof.s_prime, w.proof.d_prime)


def test_batch_prove_known_challenges_matches_prove():
    """Deterministic transcripts. On XLA:CPU batch_prove falls back to
    sequential proves inside a ProofBatch (the vmapped pipeline OOMs LLVM —
    see batch_prove's CPU gate); this still covers the ProofBatch container
    and its zero-restacking handoff to batch_verify. The vmapped pipeline
    itself runs on TPU via bench.py."""
    curve = curve_ops("edwards25519")
    n, m, K = 8, 1, 3
    pk = PublicKey.new(curve, n * m)
    provers = _provers(pk, n, m, K)

    det_t = lambda: [DeterministicTranscript(m) for _ in range(K)]  # noqa: E731
    det_r = lambda: [DeterministicRng(m) for _ in range(K)]  # noqa: E731
    pbatch = batch_prove(curve, pk, n, provers,
                         transcripts=det_t(), rngs=det_r())
    assert isinstance(pbatch, ProofBatch)
    assert len(pbatch) == K and pbatch.rounds == 3

    for i, p in enumerate(provers):
        _assert_same(curve, pbatch[i], prove(
            curve, pk, n, p, transcript=DeterministicTranscript(m),
            rng=DeterministicRng(m)))

    commits = stack_commitments(
        curve, [p.commitment_vec for p in provers])
    # m=1 takes the vmapped single-verifier path (e² equation form)
    batch_verify(curve, pk, n, pbatch, commits, transcripts=det_t())
    bad = dataclasses.replace(
        pbatch,
        r_prime=pbatch.r_prime.at[0].set(
            jnp.asarray(curve.fn.encode(31337))),
    )
    with pytest.raises(VerificationError):
        batch_verify(curve, pk, n, bad, commits, transcripts=det_t())


def test_batch_prove_interactive_sha_matches_prove():
    """ShaTranscript (challenges depend on prover messages); blinds pinned
    by DeterministicRng so batch == sequential byte-for-byte."""
    curve = curve_ops("edwards25519")
    n, m, K = 8, 2, 2
    pk = PublicKey.new(curve, n * m)
    provers = _provers(pk, n, m, K)

    pbatch = batch_prove(
        curve, pk, n, provers,
        transcripts=[ShaTranscript(m) for _ in range(K)],
        rngs=[DeterministicRng(m) for _ in range(K)],
    )
    for i, p in enumerate(provers):
        want = prove(curve, pk, n, p,
                     transcript=ShaTranscript(m), rng=DeterministicRng(m))
        _assert_same(curve, pbatch[i], want)

    # homogeneous m>1 vmapped batch verify, non-deterministic replay path
    commits = stack_commitments(
        curve, [p.commitment_vec for p in provers])
    batch_verify(curve, pk, n, pbatch, commits,
                 transcripts=[ShaTranscript(m) for _ in range(K)])


def test_batch_verify_proofbatch_rejects_tampered():
    curve = curve_ops("edwards25519")
    n, m, K = 8, 2, 2
    pk = PublicKey.new(curve, n * m)
    provers = _provers(pk, n, m, K)
    pbatch = batch_prove(curve, pk, n, provers)
    commits = stack_commitments(
        curve, [p.commitment_vec for p in provers])
    batch_verify(curve, pk, n, pbatch, commits)

    bad = dataclasses.replace(
        pbatch,
        r_prime=pbatch.r_prime.at[1].set(
            jnp.asarray(curve.fn.encode(987654321))),
    )
    with pytest.raises(VerificationError):
        batch_verify(curve, pk, n, bad, commits)


@pytest.mark.parametrize("fb", ["0", "1"])
def test_batch_verify_fused_path_matches_m1(monkeypatch, fb):
    """The TPU fused batch-verify program (one jit: vmapped exponent
    vectors + RLC merge + MSMs + identity check) must accept what the
    eager-merged CPU path accepts and reject tampered batches — both
    generator-lane modes (ladder fb=0 / fixed-base tables fb=1), m=1
    (the e²-form single-proof equation, vmapped). The m>1 fused program
    is the same composition over _vinputs_multiple and runs on TPU every
    round via bench.py (K=64, n=64, m=16) and
    scripts/profile_batch_verify.py — its XLA:CPU compile is minutes-long
    and intermittently segfaults LLVM (see conftest), so it is not
    exercised on the CPU mesh."""
    from bulletproofsplus_tpu.protocol.batch import _batch_verify_fused

    curve = curve_ops("edwards25519")
    n, m, K = 8, 1, 3
    pk = PublicKey.new(curve, n * m)
    provers = _provers(pk, n, m, K)
    pbatch = batch_prove(curve, pk, n, provers)
    V_all = stack_commitments(curve, [p.commitment_vec for p in provers])
    monkeypatch.setenv("BPP_FIXED_BASE", fb)
    _batch_verify_fused(
        curve, pk, n, m, pbatch, V_all, [None] * K, lambda: 987654321)
    bad = dataclasses.replace(
        pbatch,
        s_prime=pbatch.s_prime.at[2].set(
            jnp.asarray(curve.fn.encode(4096))),
    )
    with pytest.raises(VerificationError):
        _batch_verify_fused(
            curve, pk, n, m, bad, V_all, [None] * K, lambda: 987654321)


def test_kbatched_program_math_matches_vmap(monkeypatch):
    """The K-batched-native whole-fold program
    (wip._wip_prove_known_kbatched_prog — opt-in BPP_PROVER_KBATCHED=1 on
    TPU) must compute the SAME function as the vmapped unrolled program.

    Pallas does not run on XLA:CPU, so the joint-ladder kernel is replaced
    by an XLA reference (per-lane scalar_mul + group sums) — this checks
    the program's MATH (the K-axis indexing, batched inversions, fold
    bookkeeping); the kernels themselves are covered at kbatched shapes in
    interpret mode by test_pallas.py, and on hardware by
    scripts/validate_prover_pallas.py's [kbatched] phase."""
    import numpy as np

    from bulletproofsplus_tpu.curves import pallas_curve
    from bulletproofsplus_tpu.msm.engine import _scalar_mul_jit
    from bulletproofsplus_tpu.protocol import wip

    def ref_joint_grouped(curve, scalars, points, nbits, jway,
                          interpret=False):
        fn = curve.fn
        lead = points.shape[:-3]
        N = points.shape[-3]
        assert N % jway == 0
        G = N // jway
        sm = _scalar_mul_jit(curve, nbits)
        prods = sm(jnp.broadcast_to(jnp.asarray(scalars), (*lead, N, fn.L)),
                   points)
        prods = prods.reshape(*lead, G, jway, *prods.shape[-2:])
        out = prods[..., 0, :, :]
        for j in range(1, jway):
            out = curve.add(out, prods[..., j, :, :])
        return out

    monkeypatch.setattr(
        pallas_curve, "joint_ladder_msm_grouped", ref_joint_grouped)

    curve = curve_ops("edwards25519")
    fn = curve.fn
    n, K = 8, 3
    logn = 3
    pk = PublicKey.new(curve, n)

    import jax

    rng = np.random.RandomState(0)

    def rnd(*shape):
        vals = [int(rng.randint(1, 1 << 30))
                for _ in range(int(np.prod(shape)))]
        return jnp.asarray(fn.encode(vals)).reshape(*shape, fn.L)

    a, b = rnd(K, n), rnd(K, n)
    ys = [int(rng.randint(2, 1 << 20)) for _ in range(K)]
    pys = [[pow(y, i + 1, fn.p) for i in range(n)] for y in ys]
    power_of_y = jnp.asarray(
        fn.encode([v for row in pys for v in row])).reshape(K, n, fn.L)
    args = (a, b, power_of_y, rnd(K), pk.G_vec, pk.H_vec, pk.g, pk.h,
            rnd(K, logn), rnd(K, logn), rnd(K, logn),
            rnd(K), rnd(K), rnd(K), rnd(K), rnd(K))

    kb = jax.jit(wip._wip_prove_known_kbatched_prog(curve, n, K))(*args)
    ref = wip._wip_prove_known_vmap_jit_impl(curve, n, False, False)(*args)

    for name, x, y in zip(
            ("L_vec", "R_vec", "A", "B", "r_prime", "s_prime", "d_prime"),
            kb, ref):
        x, y = np.asarray(x), np.asarray(y)
        if name in ("r_prime", "s_prime", "d_prime"):
            assert np.array_equal(x, y), name
        else:
            xs = x.reshape(-1, *x.shape[-2:])
            ys_ = y.reshape(-1, *y.shape[-2:])
            for i in range(xs.shape[0]):
                assert curve.decode_point(xs[i]) == curve.decode_point(
                    ys_[i]), (name, i)
