from .spec import (
    ALL_SPECS,
    BLS12_381_FQ,
    BLS12_381_FR,
    ED25519_FL,
    ED25519_FP,
    LIMB_BITS,
    LIMB_MASK,
    SECP256K1_FN,
    SECP256K1_FP,
    FieldSpec,
)
from .ops import FieldOps, field_ops

__all__ = [
    "ALL_SPECS",
    "BLS12_381_FQ",
    "BLS12_381_FR",
    "ED25519_FL",
    "ED25519_FP",
    "LIMB_BITS",
    "LIMB_MASK",
    "SECP256K1_FN",
    "SECP256K1_FP",
    "FieldSpec",
    "FieldOps",
    "field_ops",
]
