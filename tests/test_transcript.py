"""Transcript behavior: determinism, domain separation, sensitivity."""
import jax.numpy as jnp

from bulletproofsplus_tpu.curves import curve_ops, golden_curve
from bulletproofsplus_tpu.transcript import (
    DeterministicRng,
    DeterministicTranscript,
    ShaTranscript,
    SystemRng,
)


def test_deterministic_constants():
    t1 = DeterministicTranscript(1)
    assert t1.challenge_yz() == (7, 7)
    tm = DeterministicTranscript(4)
    assert tm.challenge_yz() == (12, 23)
    assert tm.round_challenge(None, None, None) == 7
    assert tm.final_challenge(None, None, None) == 99
    r1, rm = DeterministicRng(1), DeterministicRng(2)
    assert r1.alpha() == 7 and rm.alpha() == 33
    assert rm.round_blinds() == (4, 5)
    assert rm.final_blinds() == (33, 44, 88, 123)


def test_sha_transcript_deterministic_and_sensitive():
    curve = curve_ops("edwards25519")
    gc = golden_curve("edwards25519")
    g = jnp.asarray(curve.encode_point(gc.base()))
    g2 = jnp.asarray(curve.encode_point(gc.dbl(gc.base())))

    a = ShaTranscript(2)
    b = ShaTranscript(2)
    ya, za = a.challenge_yz(curve, [g, g2], g)
    yb, zb = b.challenge_yz(curve, [g, g2], g)
    assert (ya, za) == (yb, zb)
    assert ya != za  # distinct squeezes
    assert 0 < ya < curve.fn.p

    ea = a.round_challenge(curve, g, g2)
    eb = b.round_challenge(curve, g2, g)  # swapped → different
    assert ea != eb

    # m is absorbed: different aggregation count → different challenges
    c = ShaTranscript(4)
    yc, _ = c.challenge_yz(curve, [g, g2], g)
    assert yc != ya

    # identity point serializes distinctly
    ident = jnp.asarray(curve.encode_point(None))
    d = ShaTranscript(2)
    yd, _ = d.challenge_yz(curve, [ident, g2], g)
    assert yd != ya


def test_system_rng_range():
    rng = SystemRng(97)
    for _ in range(20):
        assert 1 <= rng.alpha() < 97
    assert len(set(rng.final_blinds()) | {rng.alpha()}) > 1
