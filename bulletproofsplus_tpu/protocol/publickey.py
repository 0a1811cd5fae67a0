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
        """Small-multiple generators (publickey.rs:23-39).

        Setup is input preparation, not proving/verifying work, so the
        2·length+2 small scalar multiplications run in the native C++ host
        library (the analogue of the reference doing setup through mcl) and
        the points are uploaded as limb tensors — no device program at all."""
        from ..curves.instances import base_point
        from ..hostmath import host_curve

        hc = host_curve(curve.name)
        base = base_point(curve.name)
        ks = ([1, 2] + [3 * (i + 1) for i in range(length)]
              + [5 * (i + 1) for i in range(length)])
        pts = [hc.mul(base, k) for k in ks]
        enc = curve.encode_points(pts)
        return cls(
            curve=curve,
            g=jnp.asarray(enc[0]),
            h=jnp.asarray(enc[1]),
            G_vec=jnp.asarray(enc[2 : 2 + length]),
            H_vec=jnp.asarray(enc[2 + length :]),
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

    def fixed_tables(self, mn: int, layout: str | None = None):
        """Cached fixed-base window tables for [G_vec[:mn] ‖ H_vec[:mn]]
        (msm/fixed.py): one-time per (pk, mn, layout), reused by every
        subsequent verification over this generator set.

        layout "kernel" (2D, the Pallas lookup kernel's limb-major form) or
        "xla" (5D, the select-tree path / sharded fixed MSM); default picks
        the kernel layout whenever the Pallas MSM path is active. Flavor
        (unsigned vs signed half-size entries) comes from
        msm.fixed.fixed_base_mode's memory budget. Multi-GB kernel tables
        (bls12-381 at large mn) build in point-axis CHUNKS and return a
        tuple of 2D chunk tables, bounding build/transpose peak memory to
        ~one chunk above the table itself."""
        if layout is None:
            from ..msm.engine import _ladder_ok

            layout = "kernel" if _ladder_ok(self.curve) else "xla"
        cache = self.__dict__.setdefault("_fb_tables", {})
        t = cache.get((mn, layout))
        if t is None:
            from ..msm.fixed import (
                fixed_base_mode,
                precompute_tables,
                precompute_tables_signed,
                table_bytes,
            )

            mode = fixed_base_mode(self.curve, 2 * mn) or "unsigned"
            signed = mode == "signed"
            build = (precompute_tables_signed if signed
                     else precompute_tables)
            pts = jnp.concatenate([self.G_vec[:mn], self.H_vec[:mn]], axis=0)
            N = pts.shape[0]
            # chunk so each chunk's table stays under ~1 GiB of build peak
            total = table_bytes(self.curve, N, signed=signed)
            nchunks = max(1, -(-total // (1 << 30)))
            if layout == "kernel":
                from ..curves.pallas_curve import fixed_table_kernel_layout

                if nchunks == 1:
                    t = fixed_table_kernel_layout(self.curve, build(
                        self.curve, pts))
                else:
                    cn = -(-N // nchunks)
                    t = tuple(
                        fixed_table_kernel_layout(self.curve, build(
                            self.curve, pts[i * cn: (i + 1) * cn]))
                        for i in range(nchunks)
                    )
            else:
                t = build(self.curve, pts)
            cache[(mn, layout)] = t
        return t

    def commitment(self, v: int, gamma: int) -> jnp.ndarray:
        """Pedersen commitment g·v + h·gamma (publickey.rs:50-52).

        Commitment creation is the committer's (host) step, not the proving
        hot path — computed in the native host library and uploaded."""
        from ..hostmath import host_curve

        hc = host_curve(self.curve.name)
        if not hasattr(self, "_gh_affine"):
            self._gh_affine = (self.curve.decode_point(self.g),
                               self.curve.decode_point(self.h))
        g, h = self._gh_affine
        return jnp.asarray(
            self.curve.encode_point(hc.msm([v, gamma], [g, h]))
        )


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
