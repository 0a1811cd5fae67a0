"""Self-consistency tests of the golden pure-Python model.

These pin down the executable spec: known-answer curve vectors (mirroring the
reference's inline unit tests, SURVEY.md §4) and prove->verify roundtrips over
the (n, m) sweep the reference's commented-out integration test used
(range/mod.rs:520-566).
"""
import pytest

from bulletproofsplus_tpu.errors import VerificationError
from bulletproofsplus_tpu.golden import (
    PublicKey,
    RangeProver,
    curves,
    protocol,
)


class TestCurveKnownAnswers:
    def test_secp256k1_g_plus_g(self):
        # reference secp256k1.rs:63-70 known-answer: 2G coordinates
        c = curves.secp256k1
        two_g = c.add(c.base(), c.base())
        assert two_g[0] == int(
            "c6047f9441ed7d6d3045406e95c07cd85c778e4b8cef3ca7abac09b95c709ee5", 16
        )
        assert two_g[1] == int(
            "1ae168fea63dc339a3c58419466ceaeef7f632653266d0e1236431a950cfe52a", 16
        )

    def test_secp256k1_pubkey_vectors(self):
        # reference affine_point.rs:299-318 pubkey derivation vectors
        c = curves.secp256k1
        vec = [
            (1, "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798",
                "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8"),
            (2, "c6047f9441ed7d6d3045406e95c07cd85c778e4b8cef3ca7abac09b95c709ee5",
                "1ae168fea63dc339a3c58419466ceaeef7f632653266d0e1236431a950cfe52a"),
            (3, "f9308a019258c31049344f85f89d5229b531c845836f99b08601f113bce036f9",
                "388f7b0f632de8140fe337e62a37f3566500a99934c2231b6cb9fd7584b8e672"),
        ]
        for k, x, y in vec:
            P = c.mul(c.base(), k)
            assert P == (int(x, 16), int(y, 16))

    def test_bls_base_point_on_curve(self):
        c = curves.bls12_381_g1
        assert c.is_on_curve(c.base())
        assert c.is_on_curve(c.mul(c.base(), 12345))
        # subgroup order annihilates the generator
        assert c.mul(c.base(), c.fn.p) is None

    def test_ed25519_base(self):
        c = curves.edwards25519
        # RFC 8032 base point
        assert c.base() == (
            15112221349535400772501151409588531511454012693041857206046113283949847762202,
            46316835694926478169428394003475163141307993866256225615783033603165251855960,
        )
        assert c.is_on_curve(c.base())
        assert c.mul(c.base(), c.fn.p) is None

    def test_scalar_mul_vs_repeated_add(self):
        # mirrors bls point tests (point.rs:121-186)
        for c in (curves.bls12_381_g1, curves.secp256k1, curves.edwards25519):
            g = c.base()
            acc = None
            for k in range(1, 8):
                acc = c.add(acc, g)
                assert acc == c.mul(g, k), (c.name, k)

    def test_neg_sub(self):
        for c in (curves.bls12_381_g1, curves.secp256k1):
            g = c.base()
            assert c.add(g, c.neg(g)) is None
            assert c.add(c.mul(g, 5), c.neg(c.mul(g, 3))) == c.mul(g, 2)


class TestScalarUtil:
    def test_powers(self):
        fn = curves.bls12_381_g1.fn
        assert protocol.powers_type1(fn, 3, 4) == [1, 3, 9, 27]
        assert protocol.powers_type2(fn, 3, 4) == [3, 9, 27, 81]

    def test_sum_of_powers(self):
        fn = curves.secp256k1.fn
        for x in (2, 7, 12):
            for n in (1, 2, 4, 8, 16, 64):
                assert protocol.sum_of_powers_type1(fn, x, n) == sum(
                    pow(x, i, fn.p) for i in range(n)
                ) % fn.p
                assert protocol.sum_of_powers_type2(fn, x, n) == sum(
                    pow(x, i, fn.p) for i in range(1, n + 1)
                ) % fn.p


class TestGoldenRoundtrip:
    @pytest.mark.parametrize("curve_name", ["bls12_381", "secp256k1", "edwards25519"])
    @pytest.mark.parametrize("n,m", [(8, 1), (8, 2), (16, 2), (32, 1)])
    def test_prove_verify(self, curve_name, n, m):
        c = curves.CURVES[curve_name]
        pk = PublicKey.new(c, n * m)
        prover = RangeProver()
        for i in range(m):
            prover.commit(c, pk, v=2 + 3 * i, gamma=3 + 4 * i)
        proof = protocol.prove(c, pk, n, prover)
        protocol.verify(c, proof, pk, n, prover.commitment_vec)

    def test_reference_demo_shape(self):
        # main.rs:10-56 end-to-end demo at reduced size (n=16, m=2; the
        # reference uses n=64 which the pure-Python oracle also handles but
        # slowly — the full size is covered by the JAX differential tests)
        c = curves.bls12_381_g1
        n, m = 16, 2
        pk = PublicKey.new(c, n * m)
        prover = RangeProver()
        prover.commit(c, pk, 2, 3)
        prover.commit(c, pk, 5, 7)
        proof = protocol.prove(c, pk, n, prover)
        assert len(proof.proof.L_vec) == 5  # log2(32)
        protocol.verify(c, proof, pk, n, prover.commitment_vec)

    def test_verify_rejects_tampered(self):
        c = curves.secp256k1
        n, m = 8, 2
        pk = PublicKey.new(c, n * m)
        prover = RangeProver()
        prover.commit(c, pk, 2, 3)
        prover.commit(c, pk, 5, 7)
        proof = protocol.prove(c, pk, n, prover)
        proof.proof.r_prime = (proof.proof.r_prime + 1) % c.fn.p
        with pytest.raises(VerificationError):
            protocol.verify(c, proof, pk, n, prover.commitment_vec)

    def test_verify_rejects_out_of_range(self):
        # v >= 2^n must not verify: commit v with bits beyond n
        c = curves.secp256k1
        n = 8
        pk = PublicKey.new(c, 2 * n)
        prover = RangeProver()
        prover.commit(c, pk, 300, 3)  # 300 >= 2^8
        prover.commit(c, pk, 5, 7)
        proof = protocol.prove(c, pk, n, prover)
        with pytest.raises(VerificationError):
            protocol.verify(c, proof, pk, n, prover.commitment_vec)
