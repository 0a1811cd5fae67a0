"""Config system + high-level facade.

The reference has NO config layer: n and m are constants in main.rs:10-11,
the curve choice is a compile-time import, and deterministic-vs-random mode
is whatever constants were left hardcoded (SURVEY.md §5). Here the knobs are
one frozen dataclass — curve, bitsize, aggregation, batch, transcript/rng
mode, mesh shape — and `RangeProofSystem` binds them to a ready-to-use
prover/verifier (generators built once, transcripts/rngs minted per proof).

    cfg = Config(curve="edwards25519", n=64, m=16, mode="fs256")
    sys = RangeProofSystem(cfg)
    st = sys.statement([2, 5, ...], gammas=None)   # commit (random blinds)
    proof = sys.prove(st)
    sys.verify(proof, st.commitments)              # raises on failure
"""
from __future__ import annotations

import dataclasses
import secrets
from typing import List, Optional, Sequence

from .curves import CURVE_NAMES, curve_ops
from .errors import ProvingError
from .protocol import (
    ProofBatch,
    PublicKey,
    batch_prove,
    batch_verify,
    prove,
    stack_commitments,
    verify,
)
from .protocol.range import RangeProver
from .transcript import (
    DeterministicRng,
    DeterministicTranscript,
    Fs256Transcript,
    ShaTranscript,
    SystemRng,
)

_MODES = ("deterministic", "sha", "fs256", "merlin")


@dataclasses.dataclass(frozen=True)
class Config:
    """All knobs of the proof system in one place.

    curve: one of CURVE_NAMES. n: range bitsize (2^n bound). m: aggregation
    width (power of two). mode: Fiat-Shamir instantiation — "deterministic"
    replays the reference's constants with fixed blinds (differential
    testing ONLY — insecure); "fs256" (the library default — device-
    evaluable word-aligned SHA-256 chain, one-dispatch sound prove AND
    verify), "sha" and "merlin" are sound with random blinds.
    hash_generators: derive pk generators by hash-to-curve (sound) instead
    of the reference's small-multiple scheme (publickey.rs:23-39).
    mesh_devices: shard verification MSMs over this many devices (None =
    single chip)."""

    curve: str = "edwards25519"
    n: int = 64
    m: int = 1
    mode: str = "fs256"
    hash_generators: bool = True
    mesh_devices: Optional[int] = None

    def __post_init__(self):
        if self.curve not in CURVE_NAMES:
            raise ValueError(f"unknown curve {self.curve!r}; one of {CURVE_NAMES}")
        if self.mode not in _MODES:
            raise ValueError(f"unknown mode {self.mode!r}; one of {_MODES}")


@dataclasses.dataclass
class Statement:
    """One range statement: committed values + their commitments (and, on
    the prover side, the blinding factors)."""

    prover: RangeProver

    @property
    def commitments(self):
        return self.prover.commitment_vec


class RangeProofSystem:
    """Config-bound prover/verifier with generators built once."""

    def __init__(self, config: Config):
        self.config = config
        self.curve = curve_ops(config.curve)
        if config.hash_generators:
            self.pk = PublicKey.new_secure(self.curve, config.n * config.m)
        else:
            self.pk = PublicKey.new(self.curve, config.n * config.m)
        if config.mesh_devices:
            from .parallel import default_mesh

            self.mesh = default_mesh(config.mesh_devices)
        else:
            self.mesh = None

    # -- per-proof transcript/rng minting ---------------------------------
    def _transcript(self):
        c = self.config
        if c.mode == "deterministic":
            return DeterministicTranscript(c.m)
        if c.mode == "merlin":
            from .merlin import MerlinBppTranscript

            return MerlinBppTranscript(c.m)
        if c.mode == "fs256":
            return Fs256Transcript(c.m)
        return ShaTranscript(c.m)

    def _rng(self):
        if self.config.mode == "deterministic":
            return DeterministicRng(self.config.m)
        return SystemRng(self.curve.fn.p)

    # -- API ---------------------------------------------------------------
    def statement(self, values: Sequence[int],
                  gammas: Optional[Sequence[int]] = None) -> Statement:
        """Commit m values (random blindings unless gammas given)."""
        c = self.config
        if len(values) != c.m:
            raise ProvingError(
                f"expected {c.m} values (config.m), got {len(values)}")
        if gammas is None:
            if c.mode == "deterministic":
                raise ProvingError(
                    "deterministic mode needs explicit gammas for parity")
            gammas = [secrets.randbelow(self.curve.fn.p - 1) + 1
                      for _ in values]
        prover = RangeProver()
        for v, g in zip(values, gammas):
            prover.commit(self.pk, v, g)
        return Statement(prover=prover)

    def prove(self, statement: Statement):
        return prove(self.curve, self.pk, self.config.n, statement.prover,
                     transcript=self._transcript(), rng=self._rng())

    def verify(self, proof, commitments) -> None:
        verify(self.curve, proof, self.pk, self.config.n, commitments,
               transcript=self._transcript())

    def batch_prove(self, statements: Sequence[Statement]) -> ProofBatch:
        K = len(statements)
        return batch_prove(
            self.curve, self.pk, self.config.n,
            [s.prover for s in statements],
            transcripts=[self._transcript() for _ in range(K)],
            rngs=[self._rng() for _ in range(K)],
        )

    def batch_verify(self, proofs, commitment_lists) -> None:
        K = len(proofs)
        if not isinstance(commitment_lists, (list, tuple)):
            commits = commitment_lists
        else:
            commits = stack_commitments(self.curve, commitment_lists)
        batch_verify(
            self.curve, self.pk, self.config.n, proofs, commits,
            transcripts=[self._transcript() for _ in range(K)],
            mesh=self.mesh,
        )

    # -- serialization ------------------------------------------------------
    def proof_to_bytes(self, proof) -> bytes:
        from .serialize import proof_to_bytes

        return proof_to_bytes(self.curve, proof)

    def proof_from_bytes(self, data: bytes):
        from .serialize import proof_from_bytes

        return proof_from_bytes(self.curve, data)
