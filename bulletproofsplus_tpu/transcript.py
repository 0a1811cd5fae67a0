"""Fiat-Shamir transcripts and blinding sources.

The reference stripped its Merlin transcript during the curve swap and left
hardcoded challenge/blinding constants (SURVEY.md §2.9; call-site remains at
weighted_inner_product_proof.rs:69-71, 339-348). Both modes live here:

- DeterministicTranscript / DeterministicRng replay those constants so proofs
  match the Rust reference bit-for-bit (the differential-test mode);
- ShaTranscript / SystemRng give a real, domain-separated Fiat-Shamir
  instantiation over SHA-512 with random blindings (the secure mode).

Transcripts receive DEVICE point arrays plus the curve backend and decode
lazily: the deterministic mode never syncs device→host; the hash mode decodes
each appended point once (inherent to Fiat-Shamir — the prover must hash its
own messages).

A byte-exact Merlin (STROBE-128/Keccak) implementation lives in merlin.py
(MerlinTranscript, KAT-tested against merlin-2.0 vectors) for upstream-vector
parity; ShaTranscript is sound but intentionally simpler (SHA-512, no STROBE
framing).
"""
from __future__ import annotations

import hashlib
import secrets


class DeterministicTranscript:
    """Reference constants: single y=z=7 (range/mod.rs:109-110), aggregated
    y=12 z=23 (range/mod.rs:278-279), rounds e=7 (wip:131), final e=99 (wip:211).

    `challenges_known_ahead` marks that challenges do not depend on the
    prover's messages, so the whole fold loop can run as ONE compiled device
    program with no host round-trips (wip.py known-challenge path)."""

    challenges_known_ahead = True

    def __init__(self, m: int):
        self.m = m

    def challenge_yz(self, curve=None, commitments=None, A=None):
        return (7, 7) if self.m == 1 else (12, 23)

    def round_challenge(self, curve, L, R) -> int:
        return 7

    def final_challenge(self, curve, A, B) -> int:
        return 99


class DeterministicRng:
    """Reference constants: alpha 7/33 (range/mod.rs:94, :256), round blinds
    d_L=4 d_R=5 (wip:94-95), final r=33 s=44 delta=88 eta=123 (wip:175-178)."""

    blinds_known_ahead = True

    def __init__(self, m: int):
        self.m = m

    def alpha(self) -> int:
        return 7 if self.m == 1 else 33

    def round_blinds(self):
        return (4, 5)

    def final_blinds(self):
        return (33, 44, 88, 123)


class ShaTranscript:
    """Domain-separated SHA-512 Fiat-Shamir transcript.

    Mirrors the upstream Merlin flow (proof data appended in protocol order;
    one challenge squeezed per append batch) without STROBE framing. Points
    are appended as affine (x, y) big-endian byte pairs; identity as a tagged
    empty coordinate.
    """

    def __init__(self, m: int, label: bytes = b"bulletproofsplus_tpu"):
        self._h = hashlib.sha512()
        self._absorb(b"label", label)
        self._absorb(b"m", m.to_bytes(8, "big"))
        self._counter = 0

    def _absorb(self, tag: bytes, data: bytes) -> None:
        self._h.update(len(tag).to_bytes(2, "big") + tag)
        self._h.update(len(data).to_bytes(8, "big") + data)

    def _point_bytes(self, curve, P) -> bytes:
        # P may arrive PRE-DECODED as an affine (x, y) tuple (batch callers
        # decode whole tensors with one batched inversion — replay_batch /
        # batch_prove) or as a raw device/limb array
        aff = P if (P is None or isinstance(P, tuple)) else (
            curve.decode_point(P))
        if aff is None:
            return b"\x00"
        nbytes = (curve.fp.p.bit_length() + 7) // 8
        return b"\x01" + aff[0].to_bytes(nbytes, "big") + aff[1].to_bytes(nbytes, "big")

    def append_point(self, curve, label: bytes, P) -> None:
        self._absorb(label, self._point_bytes(curve, P))

    def _challenge(self, curve, label: bytes) -> int:
        self._counter += 1
        self._absorb(b"challenge", label + self._counter.to_bytes(8, "big"))
        digest = self._h.copy().digest()
        # 512-bit digest mod group order: negligible bias (order ~2^255)
        c = int.from_bytes(digest, "big") % curve.fn.p
        return c if c != 0 else 1  # challenge 0 would be malicious (errors.rs MaliciousDealer)

    def challenge_yz(self, curve, commitments, A) -> tuple:
        """y, z after absorbing the statement (commitments) and A."""
        for i, V in enumerate(commitments):
            self.append_point(curve, b"V%d" % i, V)
        self.append_point(curve, b"A", A)
        return self._challenge(curve, b"y"), self._challenge(curve, b"z")

    def round_challenge(self, curve, L, R) -> int:
        self.append_point(curve, b"L", L)
        self.append_point(curve, b"R", R)
        return self._challenge(curve, b"e")

    def final_challenge(self, curve, A, B) -> int:
        self.append_point(curve, b"A_wip", A)
        self.append_point(curve, b"B", B)
        return self._challenge(curve, b"e_final")


class SystemRng:
    """Cryptographically random blindings over the curve's scalar field."""

    def __init__(self, order: int):
        self.order = order

    def _r(self) -> int:
        return secrets.randbelow(self.order - 1) + 1

    def alpha(self) -> int:
        return self._r()

    def round_blinds(self):
        return (self._r(), self._r())

    def final_blinds(self):
        return (self._r(), self._r(), self._r(), self._r())
