"""Wire-format tests: proof and public-key byte round-trips, malformed
input rejection (the reference's ProofError::FormatError, errors.rs:19)."""
import numpy as np
import pytest

from bulletproofsplus_tpu import (
    PublicKey,
    RangeProver,
    curve_ops,
    prove,
    verify,
)
from bulletproofsplus_tpu.errors import FormatError
from bulletproofsplus_tpu.serialize import (
    point_len,
    proof_from_bytes,
    proof_to_bytes,
    publickey_from_bytes,
    publickey_to_bytes,
)


@pytest.mark.parametrize("curve_name", ["edwards25519", "secp256k1"])
def test_proof_bytes_roundtrip(curve_name):
    curve = curve_ops(curve_name)
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    p = RangeProver()
    p.commit(pk, 2, 3)
    p.commit(pk, 5, 7)
    proof = prove(curve, pk, n, p)
    data = proof_to_bytes(curve, proof)
    # 2·log2(nm)+3 points + 3 scalars + rounds byte (wip:18-23)
    rounds = proof.proof.rounds
    assert len(data) >= 1 + (2 * rounds + 3) * point_len(curve)
    restored = proof_from_bytes(curve, data)
    verify(curve, restored, pk, n, p.commitment_vec)

    with pytest.raises(FormatError):
        proof_from_bytes(curve, data[:-1])  # truncated
    bad = bytearray(data)
    bad[0] = 200  # absurd round count
    with pytest.raises(FormatError):
        proof_from_bytes(curve, bytes(bad))


def test_publickey_bytes_roundtrip():
    curve = curve_ops("edwards25519")
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    data = publickey_to_bytes(curve, pk)
    pk2 = publickey_from_bytes(curve, data)
    assert pk2.length == pk.length
    assert np.array_equal(np.asarray(pk2.G_vec), np.asarray(pk.G_vec))
    assert np.array_equal(np.asarray(pk2.h), np.asarray(pk.h))

    # proofs made under the original pk verify under the restored one
    p = RangeProver()
    p.commit(pk, 2, 3)
    p.commit(pk, 5, 7)
    proof = prove(curve, pk, n, p)
    verify(curve, proof, pk2, n, p.commitment_vec)

    with pytest.raises(FormatError):
        publickey_from_bytes(curve, data[:-1])
    with pytest.raises(FormatError):
        publickey_from_bytes(curve_ops("secp256k1"), data)  # wrong curve


def test_ed25519_torsion_point_rejected():
    """An 8-torsion point (here the order-2 point (0, p-1)) is on-curve but
    outside the prime-order subgroup: deserialization must reject it
    (round-4 verdict missing #4 — attacker-controlled proof/pk bytes must
    land in the group the soundness argument lives in)."""
    from bulletproofsplus_tpu.golden.curves import CURVES as GOLDEN
    from bulletproofsplus_tpu.serialize import in_subgroup, point_from_bytes

    curve = curve_ops("edwards25519")
    gc = GOLDEN["edwards25519"]
    p = curve.fp.p
    # order-2 point (0, -1): valid compressed encoding, on-curve
    enc = bytearray((p - 1).to_bytes(32, "little"))
    assert gc.is_on_curve((0, p - 1))
    assert not in_subgroup(curve, (0, p - 1))
    with pytest.raises(FormatError):
        point_from_bytes(curve, bytes(enc))
    # and inside a proof: swap a legit point for the torsion point
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    pr = RangeProver()
    pr.commit(pk, 2, 3)
    pr.commit(pk, 5, 7)
    data = bytearray(proof_to_bytes(curve, prove(curve, pk, n, pr)))
    data[1:33] = enc  # overwrite A
    with pytest.raises(FormatError):
        proof_from_bytes(curve, bytes(data))


def test_bls12_381_non_subgroup_point_rejected():
    """A point on y² = x³ + 4 outside the r-order subgroup (cofactor is
    ~2^125) must fail to deserialize."""
    from bulletproofsplus_tpu.golden.curves import CURVES as GOLDEN
    from bulletproofsplus_tpu.protocol.publickey import _sqrt_mod
    from bulletproofsplus_tpu.serialize import in_subgroup, point_from_bytes

    curve = curve_ops("bls12_381")
    gc = GOLDEN["bls12_381"]
    q = curve.fp.p
    P = None
    for x in range(1, 64):
        y = _sqrt_mod((x * x % q * x + 4) % q, q)
        if y is None:
            continue
        if not in_subgroup(curve, (x, y)):  # on-curve, NOT in r-subgroup
            P = (x, y)
            break
    assert P is not None, "no non-subgroup point found in search range"
    enc = bytes([2 + (P[1] & 1)]) + P[0].to_bytes(48, "big")
    with pytest.raises(FormatError):
        point_from_bytes(curve, enc)
    # sanity: a genuine subgroup point still decodes
    from bulletproofsplus_tpu.serialize import point_bytes

    g_aff = (gc.gx, gc.gy)
    assert point_from_bytes(curve, point_bytes(curve, g_aff)) == g_aff
