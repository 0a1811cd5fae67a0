"""Pure-Python elliptic-curve arithmetic — executable spec / test oracle.

Covers the three curve backends the framework exposes:
  - bls12-381 G1 (the reference's active backend behind mcl,
    src/bls12_381/building_block/point/point.rs)
  - secp256k1 (the reference's parallel from-scratch stack,
    src/secp256k1/building_block/secp256k1/secp256k1.rs:20-53)
  - edwards25519 / ristretto255 (the curve the upstream dalek-based
    BulletProofsPlus used; BASELINE configs 1-2)

API points are affine tuples (x, y) with None as the identity — the simplest
unambiguous representation. Internally mul/msm run in Jacobian (Weierstrass)
or projective (Edwards) coordinates so that only one field inversion happens
per public-API result. The TPU implementation uses branchless complete
projective/extended formulas and is differential-tested against this module.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from .field import (
    ED25519_P,
    Fp,
    bls_fq,
    bls_fr,
    ed_fl,
    ed_fp,
    secp_fn,
    secp_fp,
)

Affine = Optional[Tuple[int, int]]  # None == point at infinity


@dataclasses.dataclass(frozen=True)
class WeierstrassCurve:
    """Short Weierstrass y^2 = x^3 + a x + b over fp, group order in fn."""

    name: str
    fp: Fp
    fn: Fp
    a: int
    b: int
    gx: int
    gy: int

    # ---- internal Jacobian ops (X, Y, Z); identity is Z == 0 ----

    def _to_jac(self, P: Affine):
        if P is None:
            return (1, 1, 0)
        return (P[0], P[1], 1)

    def _to_affine(self, J) -> Affine:
        X, Y, Z = J
        p = self.fp.p
        if Z % p == 0:
            return None
        zi = pow(Z, p - 2, p)
        zi2 = zi * zi % p
        return (X * zi2 % p, Y * zi2 % p * zi % p)

    def _jdbl(self, J):
        p = self.fp.p
        X, Y, Z = J
        if Z == 0 or Y == 0:
            return (1, 1, 0)
        S = 4 * X % p * Y % p * Y % p
        M = (3 * X % p * X + self.a * pow(Z, 4, p)) % p
        X3 = (M * M - 2 * S) % p
        Y3 = (M * (S - X3) - 8 * pow(Y, 4, p)) % p
        Z3 = 2 * Y % p * Z % p
        return (X3, Y3, Z3)

    def _jadd(self, J1, J2):
        p = self.fp.p
        X1, Y1, Z1 = J1
        X2, Y2, Z2 = J2
        if Z1 == 0:
            return J2
        if Z2 == 0:
            return J1
        Z1Z1 = Z1 * Z1 % p
        Z2Z2 = Z2 * Z2 % p
        U1 = X1 * Z2Z2 % p
        U2 = X2 * Z1Z1 % p
        S1 = Y1 * Z2 % p * Z2Z2 % p
        S2 = Y2 * Z1 % p * Z1Z1 % p
        if U1 == U2:
            if S1 != S2:
                return (1, 1, 0)
            return self._jdbl(J1)
        H = (U2 - U1) % p
        R = (S2 - S1) % p
        H2 = H * H % p
        H3 = H2 * H % p
        U1H2 = U1 * H2 % p
        X3 = (R * R - H3 - 2 * U1H2) % p
        Y3 = (R * (U1H2 - X3) - S1 * H3) % p
        Z3 = H * Z1 % p * Z2 % p
        return (X3, Y3, Z3)

    def _jmul(self, J, k: int):
        k %= self.fn.p
        R = (1, 1, 0)
        while k:
            if k & 1:
                R = self._jadd(R, J)
            J = self._jdbl(J)
            k >>= 1
        return R

    # ---- public affine API ----

    def is_on_curve(self, P: Affine) -> bool:
        if P is None:
            return True
        x, y = P
        return self.fp.sub(self.fp.mul(y, y),
                           (x * x * x + self.a * x + self.b) % self.fp.p) == 0

    def is_identity(self, P: Affine) -> bool:
        return P is None

    def add(self, P: Affine, Q: Affine) -> Affine:
        return self._to_affine(self._jadd(self._to_jac(P), self._to_jac(Q)))

    def dbl(self, P: Affine) -> Affine:
        return self._to_affine(self._jdbl(self._to_jac(P)))

    def neg(self, P: Affine) -> Affine:
        if P is None:
            return None
        return (P[0], self.fp.neg(P[1]))

    def mul(self, P: Affine, k: int) -> Affine:
        return self._to_affine(self._jmul(self._to_jac(P), k))

    def base(self) -> Affine:
        return (self.gx, self.gy)

    def sum(self, points: Sequence[Affine]) -> Affine:
        acc = (1, 1, 0)
        for P in points:
            acc = self._jadd(acc, self._to_jac(P))
        return self._to_affine(acc)

    def msm(self, scalars, points) -> Affine:
        """Naive MSM — semantics of MulVec::calculate (mulvec.rs:20-33)."""
        acc = (1, 1, 0)
        for s, P in zip(scalars, points):
            acc = self._jadd(acc, self._jmul(self._to_jac(P), s))
        return self._to_affine(acc)


@dataclasses.dataclass(frozen=True)
class EdwardsCurve:
    """Twisted Edwards -x^2 + y^2 = 1 + d x^2 y^2 (a = -1, ed25519)."""

    name: str
    fp: Fp
    fn: Fp  # prime-order subgroup order l
    d: int
    gx: int
    gy: int

    # ---- internal projective (X, Y, Z) ops, complete a=-1 formulas ----

    def _to_proj(self, P: Affine):
        if P is None:
            return (0, 1, 1)
        return (P[0], P[1], 1)

    def _to_affine(self, J) -> Affine:
        X, Y, Z = J
        p = self.fp.p
        zi = pow(Z, p - 2, p)
        x, y = X * zi % p, Y * zi % p
        if x == 0 and y == 1:
            return None
        return (x, y)

    def _padd(self, P1, P2):
        # add-2008-bbjlp, complete for a = -1 and d a non-square
        p = self.fp.p
        X1, Y1, Z1 = P1
        X2, Y2, Z2 = P2
        A = Z1 * Z2 % p
        B = A * A % p
        C = X1 * X2 % p
        D = Y1 * Y2 % p
        E = self.d * C % p * D % p
        F = (B - E) % p
        G = (B + E) % p
        X3 = A * F % p * ((X1 + Y1) * (X2 + Y2) % p - C - D) % p
        Y3 = A * G % p * (D + C) % p  # a = -1: D - a*C = D + C
        Z3 = F * G % p
        return (X3, Y3, Z3)

    def _pmul(self, P, k: int):
        k %= self.fn.p
        R = (0, 1, 1)
        while k:
            if k & 1:
                R = self._padd(R, P)
            P = self._padd(P, P)
            k >>= 1
        return R

    # ---- public affine API ----

    def is_on_curve(self, P: Affine) -> bool:
        if P is None:
            return True
        x, y = P
        fp = self.fp
        lhs = (-x * x + y * y) % fp.p
        rhs = (1 + self.d * x * x % fp.p * y % fp.p * y) % fp.p
        return lhs == rhs

    def is_identity(self, P: Affine) -> bool:
        # the Edwards identity has affine coordinates (0, 1)
        return P is None or P == (0, 1)

    def add(self, P: Affine, Q: Affine) -> Affine:
        return self._to_affine(self._padd(self._to_proj(P), self._to_proj(Q)))

    def dbl(self, P: Affine) -> Affine:
        return self.add(P, P)

    def neg(self, P: Affine) -> Affine:
        if P is None:
            return None
        return (self.fp.neg(P[0]), P[1])

    def mul(self, P: Affine, k: int) -> Affine:
        return self._to_affine(self._pmul(self._to_proj(P), k))

    def base(self) -> Affine:
        return (self.gx, self.gy)

    def sum(self, points: Sequence[Affine]) -> Affine:
        acc = (0, 1, 1)
        for P in points:
            acc = self._padd(acc, self._to_proj(P))
        return self._to_affine(acc)

    def msm(self, scalars, points) -> Affine:
        acc = (0, 1, 1)
        for s, P in zip(scalars, points):
            acc = self._padd(acc, self._pmul(self._to_proj(P), s))
        return self._to_affine(acc)


# ---------------------------------------------------------------------------
# Curve instances
# ---------------------------------------------------------------------------

# bls12-381 G1 generator — the decimal base point hardcoded by the reference
# at src/bls12_381/building_block/point/point.rs:15-18.
BLS_GX = 3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507
BLS_GY = 1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569

bls12_381_g1 = WeierstrassCurve(
    name="bls12_381",
    fp=bls_fq,
    fn=bls_fr,
    a=0,
    b=4,
    gx=BLS_GX,
    gy=BLS_GY,
)

# secp256k1 params — reference secp256k1.rs:20-53
secp256k1 = WeierstrassCurve(
    name="secp256k1",
    fp=secp_fp,
    fn=secp_fn,
    a=0,
    b=7,
    gx=0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    gy=0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)

# edwards25519 (ristretto255 group built on top)
ED_D = (-121665 * pow(121666, ED25519_P - 2, ED25519_P)) % ED25519_P
ED_GY = (4 * pow(5, ED25519_P - 2, ED25519_P)) % ED25519_P

SQRT_M1 = pow(2, (ED25519_P - 1) // 4, ED25519_P)


def _ed_recover_x(y: int, sign: int) -> int:
    p = ED25519_P
    y2 = y * y % p
    u = (y2 - 1) % p
    v = (ED_D * y2 + 1) % p
    # x = sqrt(u/v) via the p = 5 mod 8 trick
    x = (u * pow(v, 3, p)) % p * pow((u * pow(v, 7, p)) % p, (p - 5) // 8, p) % p
    if (v * x * x - u) % p != 0:
        x = x * SQRT_M1 % p
    if (v * x * x - u) % p != 0:
        raise ValueError("not a square")
    if x % 2 != sign:
        x = p - x
    return x


edwards25519 = EdwardsCurve(
    name="edwards25519",
    fp=ed_fp,
    fn=ed_fl,
    d=ED_D,
    gx=_ed_recover_x(ED_GY, 0),
    gy=ED_GY,
)

CURVES = {
    "bls12_381": bls12_381_g1,
    "secp256k1": secp256k1,
    "edwards25519": edwards25519,
}
