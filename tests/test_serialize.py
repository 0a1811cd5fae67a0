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
