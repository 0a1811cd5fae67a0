"""Pure-Python prime-field arithmetic — the executable spec / differential-test oracle.

Mirrors the semantics of the reference's field layers:
  - bls12-381 Fr wrapper over mcl  (reference: src/bls12_381/building_block/scalar/prime_field_elem.rs)
  - secp256k1 BigUint field        (reference: src/secp256k1/building_block/field/prime_field_elem.rs)

This module is intentionally slow and obviously-correct (Python ints); the TPU
implementation in `bulletproofsplus_tpu.fields` is differential-tested against it.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class Fp:
    """A prime field GF(p) over Python ints."""

    p: int
    name: str = "fp"

    def elem(self, x: int) -> int:
        return x % self.p

    def add(self, a: int, b: int) -> int:
        return (a + b) % self.p

    def sub(self, a: int, b: int) -> int:
        return (a - b) % self.p

    def mul(self, a: int, b: int) -> int:
        return (a * b) % self.p

    def neg(self, a: int) -> int:
        return (-a) % self.p

    def sqr(self, a: int) -> int:
        return (a * a) % self.p

    def inv(self, a: int) -> int:
        # Fermat inversion; reference uses mcl Fr::inv / extended Euclid
        # (secp256k1 `safe_inv`, prime_field_elem.rs:339-396).
        if a % self.p == 0:
            raise ZeroDivisionError(f"inverse of 0 in {self.name}")
        return pow(a, self.p - 2, self.p)

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def batch_invert(self, xs: list[int]) -> tuple[int, list[int]]:
        """Returns (prod of inverses, list of inverses).

        Semantics of the reference's `PrimeFieldElem::batch_invert`
        (bls12_381/building_block/scalar/prime_field_elem.rs:239-248): the first
        return value is the product of ALL the inverses (used as `allinv` in
        `verification_scalars`, weighted_inner_product_proof.rs:357-358).
        Implemented with the Montgomery trick (one inversion total) — an
        intentional fix of the reference's per-element naive loop.
        """
        n = len(xs)
        if n == 0:
            return 1, []
        prefix = [1] * (n + 1)
        for i, x in enumerate(xs):
            prefix[i + 1] = (prefix[i] * x) % self.p
        total_inv = self.inv(prefix[n])
        invs = [0] * n
        acc = total_inv
        for i in range(n - 1, -1, -1):
            invs[i] = (acc * prefix[i]) % self.p
            acc = (acc * xs[i]) % self.p
        return total_inv, invs


# ---------------------------------------------------------------------------
# Field instances used across the framework
# ---------------------------------------------------------------------------

# bls12-381 scalar field Fr (255 bit) — the modulus behind mcl's Fr
# (reference backend: src/bls12_381/building_block/scalar/prime_field_elem.rs)
BLS12_381_R = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
# bls12-381 base field Fq (381 bit) — the field of G1 coordinates (mcl G1)
BLS12_381_Q = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB

# secp256k1 (reference: src/secp256k1/building_block/secp256k1/secp256k1.rs:20-53)
SECP256K1_P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
SECP256K1_N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141

# curve25519 / ristretto255
ED25519_P = 2**255 - 19
ED25519_L = 2**252 + 27742317777372353535851937790883648493

bls_fr = Fp(BLS12_381_R, "bls12_381_fr")
bls_fq = Fp(BLS12_381_Q, "bls12_381_fq")
secp_fp = Fp(SECP256K1_P, "secp256k1_fp")
secp_fn = Fp(SECP256K1_N, "secp256k1_fn")
ed_fp = Fp(ED25519_P, "ed25519_fp")
ed_fl = Fp(ED25519_L, "ed25519_fl")
