"""Branchless Jacobian arithmetic for short-Weierstrass curves with a = 0
(bls12-381 G1 and secp256k1).

Points are (..., 3, L) int32 limb tensors (X, Y, Z in Montgomery form,
Jacobian coordinates); the identity is any point with Z = 0. The formulas are
the ones the reference cites (dbl-2009-l and add-2007-bl,
src/secp256k1/building_block/secp256k1/macros.rs:155-219), but every special
case (either operand at infinity, doubling, inverse points) is resolved with
vectorized selects instead of control flow, so whole arrays of point ops
compile to straight-line XLA.

Prime-order-subgroup assumption: no point has Y = 0 (no rational 2-torsion on
y^2 = x^3 + b for our curves), so dbl's Z3 = 2·Y·Z vanishes only at infinity.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields.ops import FieldOps


class WeierstrassOps:
    """Vectorized Jacobian point ops over a FieldOps base field."""

    COORDS = 3

    def __init__(self, fp: FieldOps, fn: FieldOps, b: int, name: str):
        self.fp = fp
        self.fn = fn  # scalar field (group order)
        self.name = name
        self.b = b
        # identity: (1, 1, 0) in Montgomery form
        self.identity_np = np.stack([fp.one_np, fp.one_np, fp.zero_np])

    # ------------------------------------------------------------------
    # host conversions (affine ints ↔ device limb tensors)
    # ------------------------------------------------------------------

    def encode_point(self, P: Optional[Tuple[int, int]]) -> np.ndarray:
        if P is None:
            return self.identity_np.copy()
        x, y = P
        return np.stack([self.fp.encode(x), self.fp.encode(y), self.fp.one_np])

    def encode_points(self, Ps) -> np.ndarray:
        return np.stack([self.encode_point(P) for P in Ps])

    def decode_point(self, arr) -> Optional[Tuple[int, int]]:
        a = np.asarray(arr)
        Z = self.fp.decode(a[..., 2, :])
        if Z == 0:
            return None
        p = self.fp.p
        zi = pow(Z, p - 2, p)
        x = self.fp.decode(a[..., 0, :]) * zi * zi % p
        y = self.fp.decode(a[..., 1, :]) * zi * zi % p * zi % p
        return (x, y)

    def decode_points(self, arr):
        a = np.asarray(arr)
        return [self.decode_point(a[i]) for i in range(a.shape[0])]

    # ------------------------------------------------------------------
    # core ops (all jnp, branchless)
    # ------------------------------------------------------------------

    def identity_like(self, shape_prefix) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(self.identity_np), (*shape_prefix, 3, self.fp.L)
        )

    def is_identity(self, P):
        return self.fp.is_zero(P[..., 2, :])

    def select(self, mask, P, Q):
        """mask ? P : Q with mask shaped like P.shape[:-2] (or scalar)."""
        return jnp.where(jnp.asarray(mask)[..., None, None], P, Q)

    def neg(self, P):
        f = self.fp
        Y = f.neg(P[..., 1, :])
        return jnp.concatenate(
            [P[..., 0:1, :], Y[..., None, :], P[..., 2:3, :]], axis=-2
        )

    def dbl(self, P):
        """dbl-2009-l (a = 0). Maps identity → identity automatically."""
        f = self.fp
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        A = f.sqr(X1)
        B = f.sqr(Y1)
        C = f.sqr(B)
        t = f.sqr(f.add(X1, B))
        D = f.add(t2 := f.sub(f.sub(t, A), C), t2)  # 2*((X1+B)^2 - A - C)
        E = f.add(f.add(A, A), A)  # 3*A
        F = f.sqr(E)
        X3 = f.sub(F, f.add(D, D))
        C2 = f.add(C, C)
        C4 = f.add(C2, C2)
        Y3 = f.sub(f.mul(E, f.sub(D, X3)), f.add(C4, C4))  # - 8*C
        Z3 = f.mul(f.add(Y1, Y1), Z1)
        return jnp.stack([X3, Y3, Z3], axis=-2)

    def add(self, P, Q):
        """Unified add: add-2007-bl plus selects for Z=0 / double / inverse."""
        f = self.fp
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]

        Z1Z1 = f.sqr(Z1)
        Z2Z2 = f.sqr(Z2)
        U1 = f.mul(X1, Z2Z2)
        U2 = f.mul(X2, Z1Z1)
        S1 = f.mul(f.mul(Y1, Z2), Z2Z2)
        S2 = f.mul(f.mul(Y2, Z1), Z1Z1)
        H = f.sub(U2, U1)
        R = f.sub(S2, S1)

        H2 = f.sqr(H)
        H3 = f.mul(H2, H)
        U1H2 = f.mul(U1, H2)
        X3 = f.sub(f.sub(f.sqr(R), H3), f.add(U1H2, U1H2))
        Y3 = f.sub(f.mul(R, f.sub(U1H2, X3)), f.mul(S1, H3))
        Z3 = f.mul(f.mul(H, Z1), Z2)
        gen = jnp.stack([X3, Y3, Z3], axis=-2)

        p_inf = f.is_zero(Z1)
        q_inf = f.is_zero(Z2)
        h_zero = f.is_zero(H)
        r_zero = f.is_zero(R)
        # same x: double if same y, else P + (-P) = infinity
        dbl_case = h_zero & r_zero & ~p_inf & ~q_inf
        inf_case = h_zero & ~r_zero & ~p_inf & ~q_inf

        out = gen
        out = self.select(dbl_case, self.dbl(P), out)
        out = self.select(inf_case, self.identity_like(out.shape[:-2]), out)
        out = self.select(p_inf, Q, out)
        out = self.select(q_inf, P, out)
        return out

    def eq(self, P, Q):
        """Projective equality: X1·Z2² == X2·Z1² and Y1·Z2³ == Y2·Z1³,
        with both-infinity equal (fixes the reference's JacobianPoint::eq bug,
        jacobian_point.rs:85-88, which ignored the z factors)."""
        f = self.fp
        Z1Z1 = f.sqr(P[..., 2, :])
        Z2Z2 = f.sqr(Q[..., 2, :])
        x_eq = f.eq(f.mul(P[..., 0, :], Z2Z2), f.mul(Q[..., 0, :], Z1Z1))
        y_eq = f.eq(
            f.mul(P[..., 1, :], f.mul(Q[..., 2, :], Z2Z2)),
            f.mul(Q[..., 1, :], f.mul(P[..., 2, :], Z1Z1)),
        )
        p_inf = self.is_identity(P)
        q_inf = self.is_identity(Q)
        return (p_inf & q_inf) | (~p_inf & ~q_inf & x_eq & y_eq)
