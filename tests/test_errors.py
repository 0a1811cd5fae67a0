"""Error-taxonomy tests (reference errors.rs:14-50 via SURVEY.md §2.8).

Argument validation raises the specific ProofError subclass from prove();
verify() reports every failure as VerificationError (the reference's only
actually-produced variant, range/mod.rs:508)."""
import pytest

from bulletproofsplus_tpu import (
    PublicKey,
    RangeProver,
    VerificationError,
    curve_ops,
    prove,
    verify,
)
from bulletproofsplus_tpu.errors import (
    InvalidAggregation,
    InvalidBitsize,
    InvalidGeneratorsLength,
    ProofError,
)


@pytest.fixture(scope="module")
def setup():
    curve = curve_ops("edwards25519")
    pk = PublicKey.new(curve, 16)
    prover = RangeProver()
    prover.commit(pk, 2, 3)
    prover.commit(pk, 5, 7)
    return curve, pk, prover


def test_invalid_bitsize(setup):
    curve, pk, prover = setup
    with pytest.raises(InvalidBitsize):
        prove(curve, pk, 7, prover)  # n must be in {8, 16, 32, 64}
    assert issubclass(InvalidBitsize, ProofError)


def test_invalid_aggregation(setup):
    curve, pk, _ = setup
    prover = RangeProver()
    for i in range(3):  # m=3 is not a power of two
        prover.commit(pk, i + 1, i + 2)
    with pytest.raises(InvalidAggregation):
        prove(curve, pk, 8, prover)


def test_invalid_generators_length(setup):
    curve, pk, _ = setup
    prover = RangeProver()
    for i in range(4):  # needs 32 generators, pk has 16
        prover.commit(pk, i + 1, i + 2)
    with pytest.raises(InvalidGeneratorsLength):
        prove(curve, pk, 8, prover)


def test_oversized_pk_accepted(setup):
    """The reference only errors when the generator set is SHORTER than
    n·m (errors.rs:37-41); a longer pk uses the first n·m generators.
    Proofs under an oversized pk must be byte-identical to exact-size ones
    (same generator prefix)."""
    curve, pk, prover = setup  # pk has 16 generators
    proof_big = prove(curve, pk, 8, prover)  # m=2 → needs 16 (exact here)

    # byte-identity below needs pinned challenges AND blinds (the secure
    # default randomizes blinds), so this part runs in reference mode
    from bulletproofsplus_tpu.transcript import (
        DeterministicRng,
        DeterministicTranscript,
    )

    det = lambda: DeterministicTranscript(1)  # noqa: E731
    pk8 = PublicKey(curve=pk.curve, g=pk.g, h=pk.h,
                    G_vec=pk.G_vec, H_vec=pk.H_vec)  # 16 gens, m=1 needs 8
    p1 = RangeProver()
    p1.commit(pk8, 200, 7)
    proof = prove(curve, pk8, 8, p1, transcript=det(),
                  rng=DeterministicRng(1))  # oversized: 16 > 8
    verify(curve, proof, pk8, 8, p1.commitment_vec, transcript=det())

    # identical bytes to a proof under the exact-size pk prefix
    from bulletproofsplus_tpu.protocol.range import pk_prefix

    pk_exact = pk_prefix(pk8, 8)
    p2 = RangeProver()
    p2.commit(pk_exact, 200, 7)
    want = prove(curve, pk_exact, 8, p2, transcript=det(),
                 rng=DeterministicRng(1))
    assert (proof.to_golden(curve).proof.r_prime
            == want.to_golden(curve).proof.r_prime)
    assert proof.to_golden(curve).A == want.to_golden(curve).A


def test_verify_maps_everything_to_verification_error(setup):
    curve, pk, prover = setup
    proof = prove(curve, pk, 8, prover)
    # bad n: surfaces as VerificationError, not InvalidBitsize
    with pytest.raises(VerificationError):
        verify(curve, proof, pk, 7, prover.commitment_vec)
    # commitment count mismatch
    with pytest.raises(VerificationError):
        verify(curve, proof, pk, 8, prover.commitment_vec[:1])
