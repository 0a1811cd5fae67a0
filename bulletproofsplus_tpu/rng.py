"""ChaCha20-based deterministic RNG.

The reference gates all randomness behind a fixed-seed ChaChaRng
(src/secp256k1/building_block/random_number.rs:8-15, callers commented out)
so every run is bit-reproducible. This is the same capability: a from-scratch
ChaCha20 block function (RFC 8439) driving a reproducible scalar stream,
usable as the `rng` argument to prove() for deterministic-but-nontrivial
test vectors (unlike the hardcoded constants of DeterministicRng).
"""
from __future__ import annotations

import struct

_CONST = b"expa" b"nd 3" b"2-by" b"te k"


def _rotl32(x, n):
    return ((x << n) | (x >> (32 - n))) & 0xFFFFFFFF


def _quarter(s, a, b, c, d):
    s[a] = (s[a] + s[b]) & 0xFFFFFFFF
    s[d] = _rotl32(s[d] ^ s[a], 16)
    s[c] = (s[c] + s[d]) & 0xFFFFFFFF
    s[b] = _rotl32(s[b] ^ s[c], 12)
    s[a] = (s[a] + s[b]) & 0xFFFFFFFF
    s[d] = _rotl32(s[d] ^ s[a], 8)
    s[c] = (s[c] + s[d]) & 0xFFFFFFFF
    s[b] = _rotl32(s[b] ^ s[c], 7)


def chacha20_block(key: bytes, counter: int, nonce: bytes) -> bytes:
    """One 64-byte ChaCha20 block (RFC 8439 §2.3)."""
    assert len(key) == 32 and len(nonce) == 12
    state = list(struct.unpack("<4I", _CONST))
    state += list(struct.unpack("<8I", key))
    state.append(counter & 0xFFFFFFFF)
    state += list(struct.unpack("<3I", nonce))
    work = state[:]
    for _ in range(10):
        _quarter(work, 0, 4, 8, 12)
        _quarter(work, 1, 5, 9, 13)
        _quarter(work, 2, 6, 10, 14)
        _quarter(work, 3, 7, 11, 15)
        _quarter(work, 0, 5, 10, 15)
        _quarter(work, 1, 6, 11, 12)
        _quarter(work, 2, 7, 8, 13)
        _quarter(work, 3, 4, 9, 14)
    out = [(w + s) & 0xFFFFFFFF for w, s in zip(work, state)]
    return struct.pack("<16I", *out)


class ChaChaRng:
    """Reproducible scalar stream over a group order (fixed seed, like the
    reference's seed_from_u64(0) ChaChaRng). Implements the prove() rng
    interface (alpha / round_blinds / final_blinds)."""

    def __init__(self, order: int, seed: int = 0):
        self.order = order
        self.key = seed.to_bytes(8, "little") * 4  # 32-byte key from u64 seed
        self.counter = 0

    def _next_bytes(self, n: int) -> bytes:
        out = b""
        while len(out) < n:
            out += chacha20_block(self.key, self.counter, b"\x00" * 12)
            self.counter += 1
        return out[:n]

    def next_scalar(self) -> int:
        # 64-byte wide reduction: negligible bias
        v = int.from_bytes(self._next_bytes(64), "little") % (self.order - 1)
        return v + 1

    def alpha(self) -> int:
        return self.next_scalar()

    def round_blinds(self):
        return (self.next_scalar(), self.next_scalar())

    def final_blinds(self):
        return (self.next_scalar(), self.next_scalar(),
                self.next_scalar(), self.next_scalar())
