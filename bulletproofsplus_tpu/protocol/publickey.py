"""Public key (generator set) and Pedersen commitments on device.

Mirrors the reference's PublicKey (src/publickey.rs:21-52): g = base point,
h = 2g, G_i = 3(i+1)g, H_i = 5(i+1)g — the deliberately-insecure
small-multiple derivation kept for bit-exact parity — plus a hash-derived
mode ("secure") the reference lacks, where generators come from hash-to-curve
style try-and-increment so their discrete logs are unknown.
"""
from __future__ import annotations

import dataclasses
import hashlib

import jax.numpy as jnp
import numpy as np

from ..msm import msm, scalar_mul


@dataclasses.dataclass
class PublicKey:
    """Device-resident generator set for one curve backend."""

    curve: object
    g: jnp.ndarray      # (C, L)
    h: jnp.ndarray      # (C, L)
    G_vec: jnp.ndarray  # (length, C, L)
    H_vec: jnp.ndarray  # (length, C, L)

    @classmethod
    def new(cls, curve, length: int) -> "PublicKey":
        """Small-multiple generators (publickey.rs:23-39), batched on device."""
        from ..curves.instances import base_point

        base = jnp.asarray(curve.encode_point(base_point(curve.name)))
        idx = np.arange(1, length + 1, dtype=object)
        ks = [1, 2] + [3 * int(i) for i in idx] + [5 * int(i) for i in idx]
        s = jnp.asarray(curve.fn.encode_plain(ks))
        nbits = max(8, (5 * length).bit_length())
        pts = scalar_mul(
            curve, s, jnp.broadcast_to(base, (len(ks), *base.shape)), nbits=nbits
        )
        return cls(
            curve=curve,
            g=pts[0],
            h=pts[1],
            G_vec=pts[2 : 2 + length],
            H_vec=pts[2 + length :],
        )

    @classmethod
    def new_secure(cls, curve, length: int, label: bytes = b"bpp-tpu-gens") -> "PublicKey":
        """Hash-derived generators with unknown discrete logs (the mode the
        upstream dalek implementation uses; absent from the reference)."""
        pts = [_hash_to_point(curve, label, i) for i in range(2 * length + 2)]
        enc = curve.encode_points(pts)
        return cls(
            curve=curve,
            g=jnp.asarray(enc[0]),
            h=jnp.asarray(enc[1]),
            G_vec=jnp.asarray(enc[2 : 2 + length]),
            H_vec=jnp.asarray(enc[2 + length :]),
        )

    @property
    def length(self) -> int:
        return self.G_vec.shape[0]

    def commitment(self, v: int, gamma: int) -> jnp.ndarray:
        """Pedersen commitment g·v + h·gamma (publickey.rs:50-52)."""
        s = jnp.asarray(self.curve.fn.encode_plain([v, gamma]))
        return msm(self.curve, s, jnp.stack([self.g, self.h]))


def _hash_to_point(curve, label: bytes, index: int):
    """Try-and-increment hash-to-curve on the golden (host) curve: hash to an
    x (Weierstrass) / y (Edwards) candidate, lift, clear cofactor."""
    from ..golden.curves import CURVES as GOLDEN

    gc = GOLDEN[curve.name]
    p = gc.fp.p
    ctr = 0
    while True:
        h = hashlib.sha512(
            label + b"|" + curve.name.encode() + b"|%d|%d" % (index, ctr)
        ).digest()
        cand = int.from_bytes(h, "big") % p
        ctr += 1
        if curve.COORDS == 3:  # Weierstrass y^2 = x^3 + b
            rhs = (cand * cand % p * cand + gc.b) % p
            y = _sqrt_mod(rhs, p)
            if y is None:
                continue
            P = (cand, min(y, p - y))
        else:  # Edwards: recover x from y
            from ..golden.curves import _ed_recover_x

            try:
                x = _ed_recover_x(cand, 0)
            except ValueError:
                continue
            P = (x, cand)
            # clear cofactor 8 so the point is in the prime-order subgroup
            P = gc.mul(P, 8)
            if gc.is_identity(P):
                continue
        if curve.name == "bls12_381":
            # clear the G1 cofactor so points land in the r-order subgroup
            P = gc.mul(P, 0x396C8C005555E1568C00AAAB0000AAAB)
            if gc.is_identity(P):
                continue
        return P


def _sqrt_mod(a: int, p: int):
    """Square root mod p (p odd prime), None if a is a non-residue."""
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # Tonelli-Shanks
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r
