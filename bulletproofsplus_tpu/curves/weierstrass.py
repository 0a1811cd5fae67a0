"""Branchless COMPLETE projective arithmetic for short-Weierstrass curves
with a = 0 (bls12-381 G1 and secp256k1).

Points are (..., 3, L) int32 limb tensors (X, Y, Z in Montgomery form,
homogeneous projective coordinates); the identity is (0, 1, 0). Uses the
Renes-Costello-Batina complete addition/doubling formulas (eprint 2015/1060,
algorithms 7 and 9 for a = 0): valid for EVERY input pair — identities,
doublings, inverses — with zero case analysis, because both curves' groups
have odd order. This replaces the reference's branchy affine/Jacobian
formulas (src/secp256k1/building_block/secp256k1/macros.rs:35-219) whose
divergent special cases would poison vectorized TPU execution.

Every formula is staged so all independent muls of a stage run as one
batched kernel (see stage.py): add = 4 mul-kernels, dbl = 4 mul-kernels.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields.ops import FieldOps, jit_method
from .stage import badd, bmul, bsub


class WeierstrassOps:
    """Vectorized complete projective point ops over a FieldOps base field."""

    COORDS = 3

    def __init__(self, fp: FieldOps, fn: FieldOps, b: int, name: str):
        self.fp = fp
        self.fn = fn  # scalar field (group order)
        self.name = name
        self.b = b
        self.b3_np = fp.encode(3 * b)  # the b3 constant of RCB a=0 formulas
        # identity: (0, 1, 0)
        self.identity_np = np.stack([fp.zero_np, fp.one_np, fp.zero_np])

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
        return (
            self.fp.decode(a[..., 0, :]) * zi % p,
            self.fp.decode(a[..., 1, :]) * zi % p,
        )

    def decode_points(self, arr):
        """Batched decode: one host batch inversion for all Z coordinates
        (fields.ops.batch_modinv) instead of a Fermat pow per point."""
        from ..fields.ops import batch_modinv

        a = np.asarray(arr)
        p = self.fp.p
        xs = self.fp.decode(a[:, 0, :])
        ys = self.fp.decode(a[:, 1, :])
        zs = self.fp.decode(a[:, 2, :])
        zi = batch_modinv(zs, p)
        return [None if zs[i] == 0 else (xs[i] * zi[i] % p,
                                         ys[i] * zi[i] % p)
                for i in range(a.shape[0])]

    # ------------------------------------------------------------------
    # core ops (all jnp, complete — no case analysis anywhere)
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

    @jit_method()
    def neg(self, P):
        f = self.fp
        Y = f.neg(P[..., 1, :])
        return jnp.concatenate(
            [P[..., 0:1, :], Y[..., None, :], P[..., 2:3, :]], axis=-2
        )

    @jit_method()
    def add(self, P, Q):
        """RCB complete addition, a = 0 (eprint 2015/1060 algorithm 7)."""
        f = self.fp
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        X2, Y2, Z2 = Q[..., 0, :], Q[..., 1, :], Q[..., 2, :]
        b3 = jnp.broadcast_to(jnp.asarray(self.b3_np), X1.shape)

        t0, t1, t2 = bmul(f, [X1, Y1, Z1], [X2, Y2, Z2])
        sx1, sy1, sz1 = badd(f, [X1, Y1, X1], [Y1, Z1, Z1])
        sx2, sy2, sz2 = badd(f, [X2, Y2, X2], [Y2, Z2, Z2])
        m3, m4, m5 = bmul(f, [sx1, sy1, sz1], [sx2, sy2, sz2])
        a01, a12, a02 = badd(f, [t0, t1, t0], [t1, t2, t2])
        t3, t4, t5 = bsub(f, [m3, m4, m5], [a01, a12, a02])
        # t3 = X1Y2+X2Y1, t4 = Y1Z2+Y2Z1, t5 = X1Z2+X2Z1
        t0_3 = f.add(f.add(t0, t0), t0)  # 3·t0
        t2b, t5b = bmul(f, [b3, b3], [t2, t5])
        z3 = f.add(t1, t2b)
        t1m = f.sub(t1, t2b)
        m_a, m_b, m_c, m_d, m_e, m_f = bmul(
            f,
            [t4, t3, t5b, t1m, t0_3, z3],
            [t5b, t1m, t0_3, z3, t3, t4],
        )
        X3 = f.sub(m_b, m_a)  # t3·t1m − t4·(b3·t5)
        Y3 = f.add(m_d, m_c)  # t1m·z3 + (b3·t5)·3t0
        Z3 = f.add(m_f, m_e)  # z3·t4 + 3t0·t3
        return jnp.stack([X3, Y3, Z3], axis=-2)

    @jit_method()
    def dbl(self, P):
        """RCB complete doubling, a = 0 (eprint 2015/1060 algorithm 9)."""
        f = self.fp
        X, Y, Z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        b3 = jnp.broadcast_to(jnp.asarray(self.b3_np), X.shape)

        t0, t1, t2, xy = bmul(f, [Y, Y, Z, X], [Y, Z, Z, Y])
        z3_2 = f.add(t0, t0)
        z3_4 = f.add(z3_2, z3_2)
        z3 = f.add(z3_4, z3_4)  # 8·Y²
        t2b = f.mul(b3, t2)
        y3 = f.add(t0, t2b)
        t1d, x3m = bmul(f, [t1, t2b], [z3, z3])
        # t2 := 3·b3·t2 ; t0 := t0 − 3·b3·t2
        t2b2 = f.add(t2b, t2b)
        t2b3 = f.add(t2b2, t2b)
        t0m = f.sub(t0, t2b3)
        y3p, x3p = bmul(f, [t0m, t0m], [y3, xy])
        Y3 = f.add(x3m, y3p)  # X3·.. + t0·Y3 per Alg 9
        X3 = f.add(x3p, x3p)  # 2·(t0−3b3t2)·XY
        return jnp.stack([X3, Y3, t1d], axis=-2)

    @jit_method()
    def eq(self, P, Q):
        """Projective cross-multiplication equality (fixes the reference's
        JacobianPoint::eq bug, jacobian_point.rs:85-88, which ignored the
        z factors)."""
        f = self.fp
        a, b, c, d = bmul(
            f,
            [P[..., 0, :], Q[..., 0, :], P[..., 1, :], Q[..., 1, :]],
            [Q[..., 2, :], P[..., 2, :], Q[..., 2, :], P[..., 2, :]],
        )
        return f.eq(a, b) & f.eq(c, d)
