"""From-scratch FIPS 180-4 hash suite: SHA-256, SHA-512, HMAC (RFC 2104).

Mirrors the reference's from-scratch hasher stack (src/secp256k1/
building_block/hasher/: sha_common.rs generic CoreLogic core :44-189,
sha256.rs :39-89, sha512.rs :46-105, hmac.rs :16-47) as one word-width-
generic core, validated against the same NIST/RFC known-answer vectors
(empty, "abc", million-a; RFC 4231 HMAC vectors).

Used by the framework for hash-derived generators and as an independent
check of the stdlib-backed transcript; structured so the compression
function is batch-vectorizable (numpy) for future on-device use.
"""
from __future__ import annotations

import dataclasses
from typing import List


@dataclasses.dataclass(frozen=True)
class _Spec:
    word_bits: int
    rounds: int
    block_bytes: int
    digest_words: int
    len_bytes: int
    iv: tuple
    k: tuple
    # sigma rotation/shift constants: (big0, big1, small0, small1), each
    # (rot1, rot2, rot_or_shift3) with the third being a plain shift
    bsig0: tuple
    bsig1: tuple
    ssig0: tuple
    ssig1: tuple


# Exact integer constants (FIPS 180-4) — computed via integer nth-root
# fractional expansion (floats lack precision for 64-bit words).
def _isqrt_frac(p: int, bits: int, root: int) -> int:
    # floor(frac(p^(1/root)) * 2^bits) via integer arithmetic
    scaled = p << (bits * root)
    lo, hi = 0, 1 << (bits + 8)
    while lo < hi - 1:
        mid = (lo + hi) // 2
        if mid**root <= scaled:
            lo = mid
        else:
            hi = mid
    return lo - ((lo >> bits) << bits)


def _primes(n: int) -> List[int]:
    ps, x = [], 2
    while len(ps) < n:
        if all(x % q for q in ps):
            ps.append(x)
        x += 1
    return ps


def _make_spec(word_bits: int) -> _Spec:
    if word_bits == 32:
        rounds, nk = 64, 64
    else:
        rounds, nk = 80, 80
    ps = _primes(nk)
    iv = tuple(_isqrt_frac(p, word_bits, 2) for p in ps[:8])
    k = tuple(_isqrt_frac(p, word_bits, 3) for p in ps)
    if word_bits == 32:
        return _Spec(32, rounds, 64, 8, 8, iv, k,
                     (2, 13, 22), (6, 11, 25), (7, 18, 3), (17, 19, 10))
    return _Spec(64, rounds, 128, 8, 16, iv, k,
                 (28, 34, 39), (14, 18, 41), (1, 8, 7), (19, 61, 6))


_SPEC256 = _make_spec(32)
_SPEC512 = _make_spec(64)


def _compress(spec: _Spec, h: List[int], block: bytes) -> List[int]:
    wb = spec.word_bits
    mask = (1 << wb) - 1

    def rotr(x, n):
        return ((x >> n) | (x << (wb - n))) & mask

    w = [int.from_bytes(block[i * wb // 8:(i + 1) * wb // 8], "big")
         for i in range(16)]
    for t in range(16, spec.rounds):
        s0 = rotr(w[t - 15], spec.ssig0[0]) ^ rotr(w[t - 15], spec.ssig0[1]) ^ (w[t - 15] >> spec.ssig0[2])
        s1 = rotr(w[t - 2], spec.ssig1[0]) ^ rotr(w[t - 2], spec.ssig1[1]) ^ (w[t - 2] >> spec.ssig1[2])
        w.append((w[t - 16] + s0 + w[t - 7] + s1) & mask)

    a, b, c, d, e, f, g, hh = h
    for t in range(spec.rounds):
        S1 = rotr(e, spec.bsig1[0]) ^ rotr(e, spec.bsig1[1]) ^ rotr(e, spec.bsig1[2])
        ch = (e & f) ^ (~e & g)
        t1 = (hh + S1 + ch + spec.k[t] + w[t]) & mask
        S0 = rotr(a, spec.bsig0[0]) ^ rotr(a, spec.bsig0[1]) ^ rotr(a, spec.bsig0[2])
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (S0 + maj) & mask
        a, b, c, d, e, f, g, hh = (t1 + t2) & mask, a, b, c, (d + t1) & mask, e, f, g
    return [(x + y) & mask for x, y in zip(h, [a, b, c, d, e, f, g, hh])]


def _hash(spec: _Spec, msg: bytes) -> bytes:
    # FIPS 180-4 padding: 0x80, zeros, big-endian bit length
    bitlen = len(msg) * 8
    msg = msg + b"\x80"
    while len(msg) % spec.block_bytes != spec.block_bytes - spec.len_bytes:
        msg += b"\x00"
    msg += bitlen.to_bytes(spec.len_bytes, "big")
    h = list(spec.iv)
    for i in range(0, len(msg), spec.block_bytes):
        h = _compress(spec, h, msg[i:i + spec.block_bytes])
    return b"".join(x.to_bytes(spec.word_bits // 8, "big") for x in h)


def sha256(msg: bytes) -> bytes:
    return _hash(_SPEC256, msg)


def sha512(msg: bytes) -> bytes:
    return _hash(_SPEC512, msg)


def hmac(key: bytes, msg: bytes, hashfn=sha256, block_bytes: int | None = None) -> bytes:
    """RFC 2104 HMAC over either hash (reference hmac.rs:16-47)."""
    bs = block_bytes or (64 if hashfn is sha256 else 128)
    if len(key) > bs:
        key = hashfn(key)
    key = key + b"\x00" * (bs - len(key))
    ipad = bytes(k ^ 0x36 for k in key)
    opad = bytes(k ^ 0x5C for k in key)
    return hashfn(opad + hashfn(ipad + msg))
