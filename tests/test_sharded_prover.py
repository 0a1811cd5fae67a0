"""Sequence-parallel prover (parallel/sharded_prover.py) on the 8-device
CPU mesh: the mn axis cyclically sharded over tp must reproduce the
single-device prover byte-for-byte (same transcript, same blinds), in both
the deterministic-replay and the sound in-graph fs256 modes."""
import jax
import pytest

from bulletproofsplus_tpu import (
    DeterministicRng,
    DeterministicTranscript,
    Fs256Transcript,
    PublicKey,
    RangeProver,
    curve_ops,
    prove,
    verify,
)
from bulletproofsplus_tpu.parallel import default_mesh, sharded_prove
from bulletproofsplus_tpu.serialize import proof_to_bytes


def _mk(curve, n, m):
    pk = PublicKey.new(curve, n * m)
    p = RangeProver()
    for i in range(m):
        p.commit(pk, (3 * i + 2) % (1 << n), 2 * i + 3)
    return pk, p


class _SeededRng:
    """Deterministic stand-in for SystemRng so the fs256 single-device and
    sharded proofs share blinds (the transcripts already match by
    construction)."""

    blinds_known_ahead = True

    def __init__(self, order, seed=12345):
        import random

        self._r = random.Random(seed)
        self.order = order

    def alpha(self):
        return self._r.randrange(1, self.order)

    def round_blinds(self):
        return (self._r.randrange(1, self.order),
                self._r.randrange(1, self.order))

    def final_blinds(self):
        return tuple(self._r.randrange(1, self.order) for _ in range(4))


@pytest.mark.parametrize("n,m,tp", [(16, 1, 4), (8, 2, 4), (16, 1, 8)])
def test_sharded_prove_deterministic_byte_exact(n, m, tp):
    curve = curve_ops("edwards25519")
    pk, prover = _mk(curve, n, m)
    mesh = default_mesh(tp, dp=1)

    ref = prove(curve, pk, n, prover,
                transcript=DeterministicTranscript(m),
                rng=DeterministicRng(m))
    got = sharded_prove(curve, pk, n, prover, mesh,
                        transcript=DeterministicTranscript(m),
                        rng=DeterministicRng(m))
    assert proof_to_bytes(curve, got) == proof_to_bytes(curve, ref)


def test_sharded_prove_edge_mn_equals_ndev():
    """mn == P: zero sharded rounds — everything runs in the replicated
    tail; still must agree."""
    curve = curve_ops("edwards25519")
    n, m, tp = 8, 1, 8
    pk, prover = _mk(curve, n, m)
    mesh = default_mesh(tp, dp=1)
    ref = prove(curve, pk, n, prover,
                transcript=DeterministicTranscript(m),
                rng=DeterministicRng(m))
    got = sharded_prove(curve, pk, n, prover, mesh,
                        transcript=DeterministicTranscript(m),
                        rng=DeterministicRng(m))
    assert proof_to_bytes(curve, got) == proof_to_bytes(curve, ref)


def test_sharded_prove_fs256_sound_and_verifies():
    """fs256 mode: the sharded prover derives challenges in-graph from
    replicated transcript state; the proof must equal the single-device
    fs256 proof AND verify under a fresh fs256 transcript replay."""
    curve = curve_ops("edwards25519")
    n, m, tp = 16, 1, 4
    pk, prover = _mk(curve, n, m)
    mesh = default_mesh(tp, dp=1)

    ref = prove(curve, pk, n, prover,
                transcript=Fs256Transcript(m),
                rng=_SeededRng(curve.fn.p))
    got = sharded_prove(curve, pk, n, prover, mesh,
                        transcript=Fs256Transcript(m),
                        rng=_SeededRng(curve.fn.p))
    assert proof_to_bytes(curve, got) == proof_to_bytes(curve, ref)
    verify(curve, got, pk, n, prover.commitment_vec,
           transcript=Fs256Transcript(m))


def test_sharded_prove_rejects_interactive_transcript():
    from bulletproofsplus_tpu import ShaTranscript

    curve = curve_ops("edwards25519")
    pk, prover = _mk(curve, 8, 1)
    mesh = default_mesh(4, dp=1)
    with pytest.raises(ValueError):
        sharded_prove(curve, pk, 8, prover, mesh,
                      transcript=ShaTranscript(1),
                      rng=DeterministicRng(1))
