"""Pure-Python golden model: the executable spec the TPU path is tested against."""
from . import curves, field, protocol
from .curves import CURVES, bls12_381_g1, edwards25519, secp256k1
from .protocol import (
    DeterministicRng,
    DeterministicTranscript,
    PublicKey,
    RangeProof,
    RangeProver,
    WipProof,
    prove,
    verify,
)

__all__ = [
    "CURVES",
    "DeterministicRng",
    "DeterministicTranscript",
    "PublicKey",
    "RangeProof",
    "RangeProver",
    "WipProof",
    "bls12_381_g1",
    "curves",
    "edwards25519",
    "field",
    "protocol",
    "prove",
    "secp256k1",
    "verify",
]
