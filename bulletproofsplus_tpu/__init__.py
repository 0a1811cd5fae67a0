"""bulletproofsplus_tpu — a TPU-native Bulletproofs+ framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the Rust
reference gogoex/BulletProofsPlus (Bulletproofs+, eprint 2020/735): Pedersen
commitments, single and aggregated range proofs via the weighted-inner-product
argument, single-MSM verification, batch verification — over bls12-381 G1,
secp256k1, and edwards25519/ristretto255, with limb-decomposed modular
arithmetic vectorized for the TPU VPU and MSMs sharded over device meshes.

Public API (mirrors the reference's src/lib.rs:11-13 re-exports):
    PublicKey, RangeProof, RangeProver, prove, verify, curve_ops
"""
from .utils.cache import setup_compilation_cache as _setup_cache

# Persistent XLA compilation cache (TPU only; see utils/cache.py). Program
# compiles dominate cold-start by 100x, so this is on for every entrypoint.
_setup_cache()

from . import errors  # noqa: E402
from .config import Config, RangeProofSystem  # noqa: E402
from .curves import CURVE_NAMES, curve_ops  # noqa: E402
from .errors import ProofError, VerificationError
from .protocol import (
    ProofBatch,
    PublicKey,
    RangeProof,
    RangeProver,
    batch_prove,
    batch_verify,
    batch_verify_identify,
    prove,
    stack_commitments,
    verify,
)
from .transcript import (
    DeterministicRng,
    DeterministicTranscript,
    Fs256Transcript,
    ShaTranscript,
    SystemRng,
)

__version__ = "0.1.0"

__all__ = [
    "CURVE_NAMES",
    "Config",
    "DeterministicRng",
    "DeterministicTranscript",
    "ProofBatch",
    "ProofError",
    "PublicKey",
    "RangeProof",
    "RangeProofSystem",
    "RangeProver",
    "Fs256Transcript",
    "ShaTranscript",
    "SystemRng",
    "VerificationError",
    "batch_prove",
    "batch_verify",
    "batch_verify_identify",
    "curve_ops",
    "errors",
    "prove",
    "stack_commitments",
    "verify",
    "__version__",
]
