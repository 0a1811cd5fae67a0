"""Differential tests: TPU protocol vs golden oracle, bit-exact in
deterministic mode, plus real-transcript round trips and rejection probes.

Restores the reference's commented-out e2e sweep shape (range/mod.rs:520-566)
at CI-friendly sizes.
"""
import jax.numpy as jnp
import pytest

from bulletproofsplus_tpu import (
    DeterministicRng,
    DeterministicTranscript,
    PublicKey,
    RangeProver,
    ShaTranscript,
    SystemRng,
    VerificationError,
    curve_ops,
    prove,
    verify,
)


def _det_prove(curve, pk, n, prover, m):
    """Reference-constant mode (opt-in since the secure-by-default flip)."""
    return prove(curve, pk, n, prover,
                 transcript=DeterministicTranscript(m),
                 rng=DeterministicRng(m))


def _det_verify(curve, proof, pk, n, commitments, m):
    verify(curve, proof, pk, n, commitments,
           transcript=DeterministicTranscript(m))
from bulletproofsplus_tpu.golden import CURVES as GOLDEN_CURVES
from bulletproofsplus_tpu.golden import (
    PublicKey as GPublicKey,
    RangeProver as GRangeProver,
    protocol as gprotocol,
)


def _setup(curve_name, n, m, vs=None, gammas=None):
    curve = curve_ops(curve_name)
    pk = PublicKey.new(curve, n * m)
    prover = RangeProver()
    vs = vs if vs is not None else [(3 * i + 2) % (1 << n) for i in range(m)]
    gammas = gammas or [2 * i + 3 for i in range(m)]
    for v, g in zip(vs, gammas):
        prover.commit(pk, v, g)
    return curve, pk, prover, vs, gammas


@pytest.mark.parametrize("curve_name,n,m", [
    ("edwards25519", 8, 1),
    ("edwards25519", 8, 2),
    ("bls12_381", 8, 2),
])
def test_prove_bit_exact_vs_golden(curve_name, n, m):
    """Deterministic mode must reproduce the golden (= reference) proof
    byte-for-byte."""
    curve, pk, prover, vs, gammas = _setup(curve_name, n, m)

    gc = GOLDEN_CURVES[curve_name]
    gpk = GPublicKey.new(gc, n * m)
    gprover = GRangeProver()
    for v, g in zip(vs, gammas):
        gprover.commit(gc, gpk, v, g)

    # commitments must agree
    assert curve.decode_points(jnp.stack(prover.commitment_vec)) == (
        gprover.commitment_vec
    )

    proof = _det_prove(curve, pk, n, prover, m)
    gproof = gprotocol.prove(gc, gpk, n, gprover)

    got = proof.to_golden(curve)
    assert got.A == gproof.A
    assert got.proof.L_vec == gproof.proof.L_vec
    assert got.proof.R_vec == gproof.proof.R_vec
    assert got.proof.A == gproof.proof.A
    assert got.proof.B == gproof.proof.B
    assert got.proof.r_prime == gproof.proof.r_prime
    assert got.proof.s_prime == gproof.proof.s_prime
    assert got.proof.d_prime == gproof.proof.d_prime

    # and the TPU verifier accepts the TPU proof
    _det_verify(curve, proof, pk, n, prover.commitment_vec, m)
    # cross-check: golden verifier accepts the decoded TPU proof
    gprotocol.verify(gc, got, gpk, n, gprover.commitment_vec)


@pytest.mark.parametrize("curve_name", ["secp256k1"])
def test_prove_bit_exact_secp(curve_name):
    curve, pk, prover, vs, gammas = _setup(curve_name, 8, 1)
    gc = GOLDEN_CURVES[curve_name]
    gpk = GPublicKey.new(gc, 8)
    gprover = GRangeProver()
    for v, g in zip(vs, gammas):
        gprover.commit(gc, gpk, v, g)
    proof = _det_prove(curve, pk, 8, prover, 1)
    gproof = gprotocol.prove(gc, gpk, 8, gprover)
    assert proof.to_golden(curve).proof.r_prime == gproof.proof.r_prime
    _det_verify(curve, proof, pk, 8, prover.commitment_vec, 1)


def test_scan_prover_bit_exact(monkeypatch):
    """The fused lax.scan prover (the TPU hot path; conftest disables it on
    CPU because its one-program-per-size compile takes minutes) must produce
    byte-identical proofs to the eager loop / golden oracle. One small config
    keeps the compile bounded; the persistent cache makes reruns instant."""
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    curve, pk, prover, vs, gammas = _setup("edwards25519", 8, 1)
    gc = GOLDEN_CURVES["edwards25519"]
    gpk = GPublicKey.new(gc, 8)
    gprover = GRangeProver()
    for v, g in zip(vs, gammas):
        gprover.commit(gc, gpk, v, g)
    proof = _det_prove(curve, pk, 8, prover, 1)
    gproof = gprotocol.prove(gc, gpk, 8, gprover)
    got = proof.to_golden(curve)
    assert got.proof.L_vec == gproof.proof.L_vec
    assert got.proof.R_vec == gproof.proof.R_vec
    assert got.proof.A == gproof.proof.A
    assert got.proof.B == gproof.proof.B
    assert got.proof.r_prime == gproof.proof.r_prime
    assert got.proof.s_prime == gproof.proof.s_prime
    assert got.proof.d_prime == gproof.proof.d_prime
    _det_verify(curve, proof, pk, 8, prover.commitment_vec, 1)


def test_unrolled_prover_bit_exact(monkeypatch):
    """The UNROLLED whole-fold prover (batch_prove's default on TPU —
    true per-round widths, ~4x less ladder work than the masked scan) must
    also match the golden oracle byte-for-byte. BPP_PROVER_SCAN=0 routes
    the single-proof path through it; mn=8 bounds the compile."""
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    monkeypatch.setenv("BPP_PROVER_SCAN", "0")
    curve, pk, prover, vs, gammas = _setup("edwards25519", 8, 1)
    gc = GOLDEN_CURVES["edwards25519"]
    gpk = GPublicKey.new(gc, 8)
    gprover = GRangeProver()
    for v, g in zip(vs, gammas):
        gprover.commit(gc, gpk, v, g)
    proof = _det_prove(curve, pk, 8, prover, 1)
    gproof = gprotocol.prove(gc, gpk, 8, gprover)
    got = proof.to_golden(curve)
    assert got.proof.L_vec == gproof.proof.L_vec
    assert got.proof.R_vec == gproof.proof.R_vec
    assert got.proof.A == gproof.proof.A
    assert got.proof.B == gproof.proof.B
    assert (got.proof.r_prime, got.proof.s_prime, got.proof.d_prime) == (
        gproof.proof.r_prime, gproof.proof.s_prime, gproof.proof.d_prime)
    _det_verify(curve, proof, pk, 8, prover.commitment_vec, 1)


@pytest.mark.parametrize("m", [1, 2])
def test_fused_verify_matches_eager(monkeypatch, m):
    """The one-program fused verifier (TPU default; ~5 dispatches fused
    into 1) must accept exactly what the eager path accepts and reject
    tampering, for both the single (e²) and aggregated (e⁻²) equation
    forms. BPP_FUSE_PROVER=1 forces the fused path on CPU."""
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    curve, pk, prover, _, _ = _setup("edwards25519", 8, m)
    proof = prove(curve, pk, 8, prover)
    verify(curve, proof, pk, 8, prover.commitment_vec)

    import dataclasses

    import jax.numpy as jnp

    bad = dataclasses.replace(
        proof,
        proof=dataclasses.replace(
            proof.proof, r_prime=jnp.asarray(curve.fn.encode(424242))
        ),
    )
    with pytest.raises(VerificationError):
        verify(curve, bad, pk, 8, prover.commitment_vec)


@pytest.mark.parametrize("curve_name", ["edwards25519"])
@pytest.mark.parametrize("n,m", [(8, 2)])
def test_real_transcript_roundtrip(curve_name, n, m):
    """ShaTranscript + SystemRng: sound mode round-trips and rejects tampering."""
    curve, pk, prover, _, _ = _setup(curve_name, n, m)
    proof = prove(
        curve, pk, n, prover,
        transcript=ShaTranscript(m), rng=SystemRng(curve.fn.p),
    )
    verify(curve, proof, pk, n, prover.commitment_vec,
           transcript=ShaTranscript(m))

    # deterministic-transcript verifier must reject a real-transcript proof
    with pytest.raises(VerificationError):
        _det_verify(curve, proof, pk, n, prover.commitment_vec, m)


@pytest.mark.parametrize("curve_name", ["edwards25519"])
def test_tampered_proof_rejected(curve_name):
    curve, pk, prover, _, _ = _setup(curve_name, 8, 2)
    proof = prove(curve, pk, 8, prover)

    # tamper r_prime
    bad = proof
    orig = bad.proof.r_prime
    bad.proof.r_prime = jnp.asarray(curve.fn.encode(12345))
    with pytest.raises(VerificationError):
        verify(curve, bad, pk, 8, prover.commitment_vec)
    bad.proof.r_prime = orig

    # tamper L_vec[0]
    orig_L = bad.proof.L_vec
    bad.proof.L_vec = orig_L.at[0].set(jnp.asarray(curve.encode_point(None)))
    with pytest.raises(VerificationError):
        verify(curve, bad, pk, 8, prover.commitment_vec)
    bad.proof.L_vec = orig_L

    # swapped commitments
    with pytest.raises(VerificationError):
        verify(curve, proof, pk, 8, prover.commitment_vec[::-1])

    # wrong n
    with pytest.raises(VerificationError):
        verify(curve, proof, pk, 8 * 2, prover.commitment_vec)


@pytest.mark.parametrize("curve_name", ["edwards25519"])
def test_out_of_range_value_rejected(curve_name):
    """v >= 2^n: prove runs (bits above n are dropped) but verify must
    reject, because the dropped bits falsify the committed value."""
    curve = curve_ops(curve_name)
    n = 8
    pk = PublicKey.new(curve, n)
    prover = RangeProver()
    prover.commit(pk, (1 << n) + 5, 7)
    proof = prove(curve, pk, n, prover)
    with pytest.raises(VerificationError):
        verify(curve, proof, pk, n, prover.commitment_vec)


@pytest.mark.parametrize("curve_name", ["edwards25519"])
def test_default_mode_is_randomized_and_sound(curve_name):
    """SECURE BY DEFAULT: prove() with no transcript/rng arguments must use
    real Fiat-Shamir challenges and fresh random blindings — two proofs of
    the same statement differ (zero-knowledge requires randomized blinds),
    both verify under the default verifier, and the reference-constant
    deterministic verifier rejects them (they are not replay-mode proofs)."""
    curve, pk, prover, _, _ = _setup(curve_name, 8, 1)
    p1 = prove(curve, pk, 8, prover)
    p2 = prove(curve, pk, 8, prover)
    g1, g2 = p1.to_golden(curve), p2.to_golden(curve)
    assert g1.A != g2.A, "default proofs must be randomized (blinds)"
    assert g1.proof.r_prime != g2.proof.r_prime
    verify(curve, p1, pk, 8, prover.commitment_vec)
    verify(curve, p2, pk, 8, prover.commitment_vec)
    with pytest.raises(VerificationError):
        _det_verify(curve, p1, pk, 8, prover.commitment_vec, 1)


def test_coeff_prover_bit_exact(monkeypatch):
    """The COEFFICIENT-FORM prover (wip_coeff.py — opt-in via
    BPP_PROVER=coeff pending its fixed-base MSM backend: no generator
    folds, every round's L/R a packed fixed-base MSM row over the
    original pk generators) must match the golden oracle byte-for-byte
    on scalars and affine points."""
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    monkeypatch.setenv("BPP_PROVER", "coeff")
    curve, pk, prover, vs, gammas = _setup("edwards25519", 8, 2)
    gc = GOLDEN_CURVES["edwards25519"]
    gpk = GPublicKey.new(gc, 16)
    gprover = GRangeProver()
    for v, g in zip(vs, gammas):
        gprover.commit(gc, gpk, v, g)
    proof = _det_prove(curve, pk, 8, prover, 2)
    gproof = gprotocol.prove(gc, gpk, 8, gprover)
    got = proof.to_golden(curve)
    assert got.proof.L_vec == gproof.proof.L_vec
    assert got.proof.R_vec == gproof.proof.R_vec
    assert got.proof.A == gproof.proof.A
    assert got.proof.B == gproof.proof.B
    assert (got.proof.r_prime, got.proof.s_prime, got.proof.d_prime) == (
        gproof.proof.r_prime, gproof.proof.s_prime, gproof.proof.d_prime)
    _det_verify(curve, proof, pk, 8, prover.commitment_vec, 2)
