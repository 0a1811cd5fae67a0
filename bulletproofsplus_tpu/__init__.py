"""bulletproofsplus_tpu — a TPU-native Bulletproofs+ framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the Rust
reference gogoex/BulletProofsPlus (Bulletproofs+, eprint 2020/735): Pedersen
commitments, single and aggregated range proofs via the weighted-inner-product
argument, single-MSM verification, batch verification — over bls12-381 G1,
secp256k1, and edwards25519/ristretto255, with limb-decomposed modular
arithmetic vectorized for the TPU VPU and MSMs sharded over device meshes.
"""
from . import errors
from .errors import ProofError, VerificationError

__version__ = "0.1.0"

__all__ = ["ProofError", "VerificationError", "errors", "__version__"]
