"""Extended-coordinate arithmetic for twisted Edwards a = -1 (edwards25519,
the curve under ristretto255 — the upstream dalek backend's group; BASELINE
configs 1-2).

Points are (..., 4, L) limb tensors (X, Y, Z, T with X·Y = Z·T, Montgomery
form). The add formula (add-2008-hwcd-3) is COMPLETE for a = -1 with d a
non-square: it is correct for doubling, identities and inverses with zero
special-casing — the ideal shape for TPU (no selects at all on the hot path).
Identity is (0, 1, 1, 0).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..fields.ops import FieldOps, jit_method
from .stage import badd, bmul, bsub


class EdwardsOps:
    """Vectorized extended-coordinate point ops for ed25519."""

    COORDS = 4

    def __init__(self, fp: FieldOps, fn: FieldOps, d: int, name: str):
        self.fp = fp
        self.fn = fn
        self.name = name
        self.d = d
        self.k2d_np = fp.encode(2 * d % fp.p)  # 2d constant for add-2008-hwcd-3
        self.identity_np = np.stack(
            [fp.zero_np, fp.one_np, fp.one_np, fp.zero_np]
        )

    # ------------------------------------------------------------------
    # host conversions
    # ------------------------------------------------------------------

    def encode_point(self, P: Optional[Tuple[int, int]]) -> np.ndarray:
        if P is None:
            return self.identity_np.copy()
        x, y = P
        t = x * y % self.fp.p
        return np.stack(
            [self.fp.encode(x), self.fp.encode(y), self.fp.one_np, self.fp.encode(t)]
        )

    def encode_points(self, Ps) -> np.ndarray:
        return np.stack([self.encode_point(P) for P in Ps])

    def decode_point(self, arr) -> Optional[Tuple[int, int]]:
        a = np.asarray(arr)
        p = self.fp.p
        Z = self.fp.decode(a[..., 2, :])
        zi = pow(Z, p - 2, p)
        x = self.fp.decode(a[..., 0, :]) * zi % p
        y = self.fp.decode(a[..., 1, :]) * zi % p
        if x == 0 and y == 1:
            return None  # golden convention: identity is None
        return (x, y)

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
        out = []
        for i in range(a.shape[0]):
            x = xs[i] * zi[i] % p
            y = ys[i] * zi[i] % p
            out.append(None if (x == 0 and y == 1) else (x, y))
        return out

    # ------------------------------------------------------------------
    # core ops
    # ------------------------------------------------------------------

    def identity_like(self, shape_prefix) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(self.identity_np), (*shape_prefix, 4, self.fp.L)
        )

    def is_identity(self, P):
        # X = 0 and T = 0 characterizes the identity among valid points
        return self.fp.is_zero(P[..., 0, :]) & self.fp.is_zero(P[..., 3, :])

    def select(self, mask, P, Q):
        return jnp.where(jnp.asarray(mask)[..., None, None], P, Q)

    @jit_method()
    def neg(self, P):
        f = self.fp
        X = f.neg(P[..., 0, :])
        T = f.neg(P[..., 3, :])
        return jnp.stack([X, P[..., 1, :], P[..., 2, :], T], axis=-2)

    @jit_method()
    def add(self, P, Q):
        """add-2008-hwcd-3 (a = -1), complete — no selects needed.
        Staged: 3 mul kernels + 1 single mul (see stage.py)."""
        f = self.fp
        X1, Y1, Z1, T1 = (P[..., i, :] for i in range(4))
        X2, Y2, Z2, T2 = (Q[..., i, :] for i in range(4))
        ym1, ym2 = bsub(f, [Y1, Y2], [X1, X2])
        yp1, yp2, Z1d = badd(f, [Y1, Y2, Z1], [X1, X2, Z1])
        A, B, T12, D = bmul(f, [ym1, yp1, T1, Z1d], [ym2, yp2, T2, Z2])
        C = f.mul(T12, jnp.broadcast_to(jnp.asarray(self.k2d_np), T12.shape))
        E, F = bsub(f, [B, D], [A, C])
        G, H = badd(f, [D, B], [C, A])
        X3, Y3, T3, Z3 = bmul(f, [E, G, E, F], [F, H, H, G])
        return jnp.stack([X3, Y3, Z3, T3], axis=-2)

    @jit_method()
    def dbl(self, P):
        """dbl-2008-hwcd (a = -1): staged as 2 mul kernels."""
        f = self.fp
        X1, Y1, Z1 = P[..., 0, :], P[..., 1, :], P[..., 2, :]
        xy = f.add(X1, Y1)
        A, B, ZZ, t = bmul(f, [X1, Y1, Z1, xy], [X1, Y1, Z1, xy])
        C = f.add(ZZ, ZZ)
        G, E1 = bsub(f, [B, t], [A, A])
        E, F = bsub(f, [E1, G], [B, C])
        H = f.neg(f.add(A, B))  # a = -1: H = D − B with D = −A
        X3, Y3, T3, Z3 = bmul(f, [E, G, E, F], [F, H, H, G])
        return jnp.stack([X3, Y3, Z3, T3], axis=-2)

    @jit_method()
    def eq(self, P, Q):
        """Projective equality: X1·Z2 == X2·Z1 and Y1·Z2 == Y2·Z1."""
        f = self.fp
        a, b, c, d = bmul(
            f,
            [P[..., 0, :], Q[..., 0, :], P[..., 1, :], Q[..., 1, :]],
            [Q[..., 2, :], P[..., 2, :], Q[..., 2, :], P[..., 2, :]],
        )
        return f.eq(a, b) & f.eq(c, d)
