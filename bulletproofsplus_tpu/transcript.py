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


FS256_LABEL = b"bulletproofsplus-tpu fs256 v1   "  # 32 bytes, word-aligned


class Fs256Transcript:
    """SHA-256 Fiat-Shamir transcript with a DEVICE-EVALUABLE byte protocol.

    Every absorbed message has static, word-aligned length, so the same
    protocol runs as jnp uint32 ops inside the prover's compiled program
    (hashers_device.py + protocol/fs256.py): the fold-loop challenges are
    derived in-graph and the sound prover needs no per-round host trip.
    This class is the host twin — byte-for-byte identical — used by the
    verifier's challenge replay and as the differential reference.

    Chain: state_0 = SHA256(label32 || be32(m));
    absorb k points: state = SHA256(state || tag4 || x_1 || y_1 || ...)
      with coordinates as cbytes big-endian integers (affine; any identity
      encodes as its natural affine for edwards (0,1), and as (0,0) for
      projective weierstrass — exactly what X·(Z⁻¹ via Fermat, 0⁻¹=0)
      evaluates to on device);
    challenge: state = SHA256(state || b"chal" || tag4 || be32(counter));
      c = int(SHA256(state || be32(1)) || SHA256(state || be32(2))) mod
      order (512-bit reduction — negligible bias), 0 mapped to 1.
    """

    challenges_known_ahead = False
    device_graph = True

    def __init__(self, m: int, label: bytes = FS256_LABEL):
        assert len(label) == 32
        self._state = hashlib.sha256(label + m.to_bytes(4, "big")).digest()
        self._counter = 0

    # -- byte protocol (host side) ---------------------------------------
    def _coord_bytes(self, curve, P):
        cbytes = (curve.fp.p.bit_length() + 7) // 8
        aff = P if (P is None or isinstance(P, tuple)) else (
            curve.decode_point(P))
        if aff is None:
            # the family's natural device affine: extended edwards identity
            # (0:1:1:0) → (0, 1); projective weierstrass (0:1:0) → Z⁻¹=0
            # under Fermat → (0, 0)
            aff = (0, 1) if getattr(curve, "COORDS", 3) == 4 else (0, 0)
        return (aff[0].to_bytes(cbytes, "big")
                + aff[1].to_bytes(cbytes, "big"))

    def _absorb_points(self, curve, tag4: bytes, points) -> None:
        assert len(tag4) == 4
        msg = self._state + tag4 + b"".join(
            self._coord_bytes(curve, P) for P in points)
        self._state = hashlib.sha256(msg).digest()

    def _challenge(self, curve, tag4: bytes) -> int:
        self._counter += 1
        self._state = hashlib.sha256(
            self._state + b"chal" + tag4
            + self._counter.to_bytes(4, "big")).digest()
        d = (hashlib.sha256(self._state + (1).to_bytes(4, "big")).digest()
             + hashlib.sha256(self._state + (2).to_bytes(4, "big")).digest())
        c = int.from_bytes(d, "big") % curve.fn.p
        return c if c != 0 else 1

    # -- transcript API ---------------------------------------------------
    def challenge_yz(self, curve, commitments, A) -> tuple:
        self._absorb_points(curve, b"stmt", list(commitments) + [A])
        return self._challenge(curve, b"y   "), self._challenge(curve,
                                                                b"z   ")

    def round_challenge(self, curve, L, R) -> int:
        self._absorb_points(curve, b"LR  ", [L, R])
        return self._challenge(curve, b"e   ")

    def final_challenge(self, curve, A, B) -> int:
        self._absorb_points(curve, b"AB  ", [A, B])
        return self._challenge(curve, b"ef  ")

    # -- device handoff ---------------------------------------------------
    def state_words(self):
        """Current 32-byte state as (8,) uint32 — the input to the device
        transcript continuation (protocol/fs256.py)."""
        import numpy as np

        return np.frombuffer(self._state, dtype=">u4").astype(np.uint32)

    def set_state_words(self, words, n_challenges: int) -> None:
        """Adopt the device program's final state (and account for the
        challenges it drew) so the host transcript can keep going."""
        import numpy as np

        self._state = b"".join(
            int(x).to_bytes(4, "big") for x in np.asarray(words))
        self._counter += n_challenges


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
