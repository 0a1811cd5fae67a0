"""Point compression and proof serialization.

The upstream had serde-based proof serialization (vestigial at reference
Cargo.toml:13-14; commented size() fns at range/mod.rs:512-517, wip:384-397).
Here: fixed-length compressed encodings per curve plus byte round-trips for
RangeProof, realizing the 2·log2(nm)+3 points + 3 scalars proof size
(wip:18-23).

Encodings (fixed length per curve):
  edwards25519:  32 bytes — y little-endian, sign(x) in the top bit (ed25519)
  secp256k1:     33 bytes — SEC1 compressed (02/03 ‖ x big-endian);
                 identity = 0x00 ‖ 32 zero bytes
  bls12_381 G1:  49 bytes — same scheme over the 48-byte base field
"""
from __future__ import annotations

import numpy as np

from .errors import FormatError


def _fp_bytes(curve) -> int:
    return (curve.fp.p.bit_length() + 7) // 8


# Curves whose cofactor exceeds 1: on-curve does NOT imply in-subgroup, so
# deserialization must also reject torsion/mixed-order points — a sound-mode
# library cannot accept attacker-controlled proof/pk bytes outside the
# prime-order group the protocol's soundness argument lives in (the same
# contract publickey.py::new_secure enforces for its own generators by
# cofactor-clearing, reference publickey.rs:13-53). secp256k1 has cofactor 1
# (on-curve == in-subgroup).
_COFACTOR = {"edwards25519": 8, "bls12_381": 0x396C8C005555E1568C00AAAB0000AAAB,
             "secp256k1": 1}


def in_subgroup(curve, P) -> bool:
    """Whether host affine P (None = identity) lies in the prime-order
    subgroup: l·P == identity with l = the group order. Cofactor-1 curves
    short-circuit (on-curve ⇒ in-subgroup).

    NOTE: gc.mul reduces the scalar mod l (correct group semantics for
    subgroup points, vacuous for this check — l·P would become 0·P), so
    the ladder runs raw over the unreduced order here."""
    from .golden.curves import CURVES as GOLDEN

    if P is None or _COFACTOR.get(curve.name, 1) == 1:
        return True
    gc = GOLDEN[curve.name]
    k = curve.fn.p
    acc, base = None, P
    while k:
        if k & 1:
            acc = gc.add(acc, base)
        base = gc.add(base, base)
        k >>= 1
    return acc is None


def _check_subgroup(curve, gc, P) -> None:
    """Raise FormatError unless P is in the prime-order subgroup. Costs one
    host scalar-mul (~1 ms) per decoded point — a deserialization-only
    cost; trusted in-process points never pass through here."""
    if not in_subgroup(curve, P):
        raise FormatError("point not in the prime-order subgroup")


def point_len(curve) -> int:
    if curve.COORDS == 4:  # edwards
        return 32
    return _fp_bytes(curve) + 1


def point_bytes(curve, P) -> bytes:
    """Compress a device point (C, L) or host affine tuple to bytes."""
    aff = P if (P is None or isinstance(P, tuple)) else curve.decode_point(P)
    if curve.COORDS == 4:
        if aff is None:
            x, y = 0, 1
        else:
            x, y = aff
        enc = bytearray(y.to_bytes(32, "little"))
        enc[31] |= (x & 1) << 7
        return bytes(enc)
    nb = _fp_bytes(curve)
    if aff is None:
        return b"\x00" + b"\x00" * nb
    x, y = aff
    return bytes([2 + (y & 1)]) + x.to_bytes(nb, "big")


def point_from_bytes(curve, data: bytes):
    """Decompress to a host affine tuple (None = identity). Raises
    FormatError for malformed or off-curve input."""
    from .golden.curves import CURVES as GOLDEN

    gc = GOLDEN[curve.name]
    p = curve.fp.p
    if curve.COORDS == 4:
        if len(data) != 32:
            raise FormatError()
        sign = data[31] >> 7
        y = int.from_bytes(bytes(data[:31]) + bytes([data[31] & 0x7F]), "little")
        if y >= p:
            raise FormatError()
        if y == 1 and sign == 0:
            return None
        from .golden.curves import _ed_recover_x

        try:
            x = _ed_recover_x(y, sign)
        except ValueError:
            raise FormatError()
        _check_subgroup(curve, gc, (x, y))
        return (x, y)
    nb = _fp_bytes(curve)
    if len(data) != nb + 1:
        raise FormatError()
    if data[0] == 0:
        if any(data[1:]):
            raise FormatError()
        return None
    if data[0] not in (2, 3):
        raise FormatError()
    x = int.from_bytes(data[1:], "big")
    if x >= p:
        raise FormatError()
    from .protocol.publickey import _sqrt_mod

    rhs = (x * x % p * x + gc.b) % p
    y = _sqrt_mod(rhs, p)
    if y is None:
        raise FormatError()
    if y & 1 != data[0] - 2:
        y = p - y
    P = (x, y)
    if not gc.is_on_curve(P):
        raise FormatError()
    _check_subgroup(curve, gc, P)
    return P


def _scalar_len(curve) -> int:
    return (curve.fn.p.bit_length() + 7) // 8


def scalar_bytes(curve, s) -> bytes:
    """Montgomery-form limb vector (L,) → little-endian bytes."""
    v = curve.fn.decode(np.asarray(s))
    return v.to_bytes(_scalar_len(curve), "little")


def scalar_from_bytes(curve, data: bytes):
    v = int.from_bytes(data, "little")
    if v >= curve.fn.p:
        raise FormatError()
    return np.asarray(curve.fn.encode(v))


def proof_to_bytes(curve, proof) -> bytes:
    """RangeProof → bytes: [rounds:u8] ‖ A ‖ L_vec ‖ R_vec ‖ A_wip ‖ B ‖
    r' ‖ s' ‖ δ' — exactly 2·rounds+3 points and 3 scalars (wip:18-23)."""
    w = proof.proof
    rounds = w.rounds
    out = bytearray([rounds])
    out += point_bytes(curve, proof.A)
    for i in range(rounds):
        out += point_bytes(curve, w.L_vec[i])
    for i in range(rounds):
        out += point_bytes(curve, w.R_vec[i])
    out += point_bytes(curve, w.A)
    out += point_bytes(curve, w.B)
    out += scalar_bytes(curve, w.r_prime)
    out += scalar_bytes(curve, w.s_prime)
    out += scalar_bytes(curve, w.d_prime)
    return bytes(out)


def proof_from_bytes(curve, data: bytes):
    """Bytes → RangeProof (device arrays). Raises FormatError on malformed
    input (the reference's ProofError::FormatError, errors.rs:19)."""
    import jax.numpy as jnp

    from .protocol.range import RangeProof
    from .protocol.wip import WipProof

    pl, sl = point_len(curve), _scalar_len(curve)
    if len(data) < 1:
        raise FormatError()
    rounds = data[0]
    need = 1 + (2 * rounds + 3) * pl + 3 * sl
    if len(data) != need:
        raise FormatError()
    off = 1

    def take_point():
        nonlocal off
        P = point_from_bytes(curve, data[off : off + pl])
        off += pl
        return curve.encode_point(P)

    A = take_point()
    L = [take_point() for _ in range(rounds)]
    R = [take_point() for _ in range(rounds)]
    A_w = take_point()
    B = take_point()
    scalars = []
    for _ in range(3):
        scalars.append(scalar_from_bytes(curve, data[off : off + sl]))
        off += sl
    C, Llimbs = A.shape
    stack = lambda xs: (
        jnp.asarray(np.stack(xs)) if xs
        else jnp.zeros((0, C, Llimbs), jnp.int32)
    )
    return RangeProof(
        A=jnp.asarray(A),
        proof=WipProof(
            L_vec=stack(L),
            R_vec=stack(R),
            A=jnp.asarray(A_w),
            B=jnp.asarray(B),
            r_prime=jnp.asarray(scalars[0]),
            s_prime=jnp.asarray(scalars[1]),
            d_prime=jnp.asarray(scalars[2]),
        ),
    )


def publickey_to_bytes(curve, pk) -> bytes:
    """PublicKey → bytes: b"BPPK1" ‖ curve-name ‖ length:u32 ‖ g ‖ h ‖
    G_vec ‖ H_vec (compressed points). Setup for large (n, m) costs
    2·n·m + 2 scalar muls (publickey.rs:23-39) — persisting it makes setup
    a one-time cost per deployment."""
    name = curve.name.encode()
    out = bytearray(b"BPPK1" + bytes([len(name)]) + name)
    out += pk.length.to_bytes(4, "big")
    out += point_bytes(curve, pk.g)
    out += point_bytes(curve, pk.h)
    for vec in (pk.G_vec, pk.H_vec):
        for aff in curve.decode_points(vec):  # ONE device fetch per vector
            out += point_bytes(curve, aff)
    return bytes(out)


def publickey_from_bytes(curve, data: bytes):
    """Bytes → PublicKey (device arrays). Raises FormatError on malformed
    input, wrong curve, or off-curve points."""
    import jax.numpy as jnp

    from .protocol.publickey import PublicKey

    name = curve.name.encode()
    head = b"BPPK1" + bytes([len(name)]) + name
    if not data.startswith(head):
        raise FormatError("not a public key for this curve")
    off = len(head)
    if len(data) < off + 4:
        raise FormatError()
    length = int.from_bytes(data[off : off + 4], "big")
    off += 4
    pl = point_len(curve)
    if len(data) != off + (2 * length + 2) * pl:
        raise FormatError()

    def take():
        nonlocal off
        P = point_from_bytes(curve, data[off : off + pl])
        off += pl
        return P

    g = take()
    h = take()
    G = [take() for _ in range(length)]
    H = [take() for _ in range(length)]
    enc = curve.encode_points([g, h] + G + H)
    return PublicKey(
        curve=curve,
        g=jnp.asarray(enc[0]),
        h=jnp.asarray(enc[1]),
        G_vec=jnp.asarray(enc[2 : 2 + length]),
        H_vec=jnp.asarray(enc[2 + length :]),
    )
