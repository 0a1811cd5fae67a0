from .batch import batch_verify
from .batchprove import batch_prove
from .publickey import PublicKey
from .range import (
    RangeProof,
    RangeProver,
    VerificationInputs,
    prove,
    verification_inputs,
    verify,
)
from .wip import WipProof, verification_scalars, wip_prove

__all__ = [
    "PublicKey",
    "RangeProof",
    "RangeProver",
    "VerificationInputs",
    "WipProof",
    "batch_prove",
    "batch_verify",
    "prove",
    "verification_inputs",
    "verification_scalars",
    "verify",
    "wip_prove",
]
