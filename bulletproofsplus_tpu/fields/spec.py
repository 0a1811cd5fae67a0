"""Field specifications: modulus → limb layout + Montgomery constants.

Why 12-bit limbs: on TPU the natural integer lane is int32. With W-bit limbs,
schoolbook multiplication needs limb products (< 2^2W) and column sums of up
to 2L such products to fit in int32, i.e. 2W + log2(2L) <= 31. W=12 satisfies
this for every modulus we care about (L <= 32 → 24 + 6 = 30), and it leaves
>= 3 bits of slack between the modulus and 2^(12L), so intermediate values
< 2p always fit in L limbs with no overflow limb. No uint32 tricks, no hi/lo
product splitting — every partial product is one int32 multiply.

This replaces the reference's native mcl Fr/Fq arithmetic
(src/bls12_381/building_block/scalar/prime_field_elem.rs:56-235) and its
BigUint secp256k1 field (src/secp256k1/building_block/field/prime_field_elem.rs)
with one modulus-parameterized vectorized implementation.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np

from ..golden.field import (
    BLS12_381_Q,
    BLS12_381_R,
    ED25519_L,
    ED25519_P,
    SECP256K1_N,
    SECP256K1_P,
)
from ..utils.convert import int_to_limbs

LIMB_BITS = 12
LIMB_MASK = (1 << LIMB_BITS) - 1


@dataclasses.dataclass(frozen=True)
class FieldSpec:
    """Static description of a prime field in limb representation.

    limb_bits picks the layout: 12-bit limbs in int32 lanes (TPU), or 24-bit
    limbs in int64 lanes (CPU backend: 4x fewer partial products, AVX-512
    vpmullq does the 64-bit multiplies; requires jax_enable_x64)."""

    name: str
    modulus: int
    limb_bits: int = LIMB_BITS

    def with_limb_bits(self, w: int) -> "FieldSpec":
        return dataclasses.replace(self, limb_bits=w)

    @property
    def mask(self) -> int:
        return (1 << self.limb_bits) - 1

    @property
    def acc_bits(self) -> int:
        """Accumulator width: int32 lanes below 16-bit limbs, else int64."""
        return 31 if self.limb_bits <= 15 else 63

    @property
    def num_limbs(self) -> int:
        # ceil(bits / W); the 2W + log2(2L) <= acc_bits constraint caps L,
        # covering the 381-bit bls12-381 base field at both layouts.
        W = self.limb_bits
        L = -(-self.modulus.bit_length() // W)
        assert 2 * W + (2 * L - 1).bit_length() <= self.acc_bits
        return L

    @property
    def R(self) -> int:
        """Montgomery radix 2^(W*L)."""
        return 1 << (self.limb_bits * self.num_limbs)

    @functools.cached_property
    def p_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.num_limbs, self.limb_bits)

    @functools.cached_property
    def r_mod_p(self) -> int:
        return self.R % self.modulus

    @functools.cached_property
    def r2_mod_p(self) -> int:
        return (self.R * self.R) % self.modulus

    @functools.cached_property
    def n0inv(self) -> int:
        """-p^{-1} mod 2^W (the word-wise Montgomery reduction multiplier)."""
        W = self.limb_bits
        return (-pow(self.modulus, -1, 1 << W)) % (1 << W)

    @functools.cached_property
    def nprime_limbs(self) -> np.ndarray:
        """-p^{-1} mod R as limbs — the full-width multiplier for the
        parallel (separated) Montgomery reduction."""
        nprime = (-pow(self.modulus, -1, self.R)) % self.R
        return int_to_limbs(nprime, self.num_limbs, self.limb_bits)


# The six moduli the framework uses (three curves × {base field, scalar field})
BLS12_381_FR = FieldSpec("bls12_381_fr", BLS12_381_R)
BLS12_381_FQ = FieldSpec("bls12_381_fq", BLS12_381_Q)
SECP256K1_FP = FieldSpec("secp256k1_fp", SECP256K1_P)
SECP256K1_FN = FieldSpec("secp256k1_fn", SECP256K1_N)
ED25519_FP = FieldSpec("ed25519_fp", ED25519_P)
ED25519_FL = FieldSpec("ed25519_fl", ED25519_L)

ALL_SPECS = {
    s.name: s
    for s in [
        BLS12_381_FR,
        BLS12_381_FQ,
        SECP256K1_FP,
        SECP256K1_FN,
        ED25519_FP,
        ED25519_FL,
    ]
}
