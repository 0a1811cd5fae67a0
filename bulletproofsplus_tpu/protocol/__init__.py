from .batch import batch_verify, batch_verify_identify
from .batchprove import batch_prove
from .publickey import PublicKey
from .range import (
    ProofBatch,
    RangeProof,
    RangeProver,
    VerificationInputs,
    prove,
    stack_commitments,
    verification_inputs,
    verify,
)
from .wip import WipProof, verification_scalars, wip_prove

__all__ = [
    "ProofBatch",
    "PublicKey",
    "RangeProof",
    "RangeProver",
    "VerificationInputs",
    "WipProof",
    "batch_prove",
    "batch_verify",
    "batch_verify_identify",
    "prove",
    "stack_commitments",
    "verification_inputs",
    "verification_scalars",
    "verify",
    "wip_prove",
]
