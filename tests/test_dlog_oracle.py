"""Independent dlog-domain check of the protocol equations (golden/dlog.py).

In reference mode every generator is a known small multiple of g
(publickey.rs:23-39), so the whole protocol collapses to integer arithmetic
mod the group order. golden/dlog.py is a SEPARATE transcription of the
reference equations (range/mod.rs prove/verify single+multiple, wip.rs
prove/verification_scalars) from golden/protocol.py — agreement between the
two oracles plus the device pipeline's bit-exact tests against golden
(tests/test_protocol_tpu.py) closes the loop on transcription-error risk
(the Rust reference itself cannot build here, SURVEY.md §0).

These tests are pure python ints (no JAX, no compiles): the dlog verifier
runs the HEADLINE shape (n=64, m=16) in milliseconds, which the
device-vs-golden differential tests cannot afford on the CPU mesh.
"""
import copy

import pytest

from bulletproofsplus_tpu.golden import (
    CURVES,
    PublicKey,
    RangeProver,
    dlog,
    protocol,
)

ED_ORDER = (1 << 252) + 27742317777372353535851937790883648493


@pytest.mark.parametrize("n,m", [(8, 1), (32, 1), (64, 1), (8, 2), (16, 4),
                                 (64, 16), (64, 64)])
def test_dlog_self_consistent(n, m):
    """Honest dlog proofs verify; tampered proofs and wrong commitments are
    rejected — at every size including the headline (n=64, m=16) and
    BASELINE config 3 (n=64, m=64) shapes."""
    q = ED_ORDER
    vs = [(3 * i + 2) % (1 << n) for i in range(m)]
    gs = [2 * i + 3 for i in range(m)]
    pf = dlog.prove(q, n, vs, gs)
    V = [(v + 2 * g) % q for v, g in zip(vs, gs)]
    assert dlog.verify(q, n, pf, V)

    bad = copy.deepcopy(pf)
    bad.r_prime = (bad.r_prime + 1) % q
    assert not dlog.verify(q, n, bad, V)
    bad = copy.deepcopy(pf)
    bad.L_vec[0] = (bad.L_vec[0] + 1) % q
    assert not dlog.verify(q, n, bad, V)
    assert not dlog.verify(q, n, pf, [(V[0] + 1) % q] + V[1:])


@pytest.mark.parametrize("curve_name", ["edwards25519", "secp256k1",
                                        "bls12_381"])
@pytest.mark.parametrize("n,m", [(8, 1), (8, 2), (16, 2)])
def test_dlog_matches_golden(curve_name, n, m):
    """Every point of a golden-oracle proof equals g^(dlog oracle's value)
    and the response scalars agree — two independent transcriptions of the
    reference prover produce the same proof."""
    c = CURVES[curve_name]
    q = c.fn.p
    pk = PublicKey.new(c, n * m)
    pr = RangeProver()
    vs = [(3 * i + 2) % (1 << n) for i in range(m)]
    gs = [2 * i + 3 for i in range(m)]
    for v, g in zip(vs, gs):
        pr.commit(c, pk, v, g)
    proof = protocol.prove(c, pk, n, pr)
    dp = dlog.prove(q, n, vs, gs)

    def eq(pt, dl):
        return pt == c.mul(pk.g, dl % q)

    assert eq(proof.A, dp.A)
    for P, dl in zip(proof.proof.L_vec, dp.L_vec):
        assert eq(P, dl)
    for P, dl in zip(proof.proof.R_vec, dp.R_vec):
        assert eq(P, dl)
    assert eq(proof.proof.A, dp.A_wip)
    assert eq(proof.proof.B, dp.B)
    assert int(proof.proof.r_prime) % q == dp.r_prime
    assert int(proof.proof.s_prime) % q == dp.s_prime
    assert int(proof.proof.d_prime) % q == dp.d_prime
    # and the independent verifier accepts what golden's verifier accepts
    protocol.verify(c, proof, pk, n, pr.commitment_vec)
    V = [(v + 2 * g) % q for v, g in zip(vs, gs)]
    assert dlog.verify(q, n, dp, V)
