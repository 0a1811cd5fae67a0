"""Native C++ host-math library vs the golden oracle (the analogue of the
reference's mcl known-answer tests, point.rs:121-186, secp256k1.rs:149-180)."""
import random

import pytest

from bulletproofsplus_tpu.golden.curves import CURVES
from bulletproofsplus_tpu.hostmath import HostField, host_curve


@pytest.mark.parametrize("name", sorted(CURVES))
def test_host_field_matches_golden(name):
    gc = CURVES[name]
    hf = HostField(gc.fp.p)
    rng = random.Random(11)
    for _ in range(10):
        a, b = rng.randrange(gc.fp.p), rng.randrange(gc.fp.p)
        assert hf.mul(a, b) == a * b % gc.fp.p
        assert hf.add(a, b) == (a + b) % gc.fp.p
        assert hf.sub(a, b) == (a - b) % gc.fp.p
    assert hf.inv(12345) == pow(12345, -1, gc.fp.p)
    assert hf.mul(0, 5) == 0
    assert hf.sub(3, gc.fp.p - 1) == 4 % gc.fp.p


@pytest.mark.parametrize("name", sorted(CURVES))
def test_host_curve_matches_golden(name):
    gc = CURVES[name]
    hc = host_curve(name)
    g = gc.base()
    rng = random.Random(12)
    # small-multiple table, the reference's 1g..10g shape (secp256k1.rs:149-180)
    for k in range(11):
        assert hc.mul(g, k) == gc.mul(g, k)
    assert hc.add(g, g) == gc.dbl(g)
    assert hc.add(None, g) == g
    assert hc.add(None, None) is None
    assert hc.add(g, gc.neg(g)) is None
    ks = [rng.randrange(gc.fn.p) for _ in range(6)]
    pts = [gc.mul(g, rng.randrange(1, gc.fn.p)) for _ in range(6)]
    for k, P in zip(ks, pts):
        assert hc.mul(P, k) == gc.mul(P, k)
    assert hc.msm(ks, pts) == gc.msm(ks, pts)
    assert hc.msm([0] * 6, pts) is None
