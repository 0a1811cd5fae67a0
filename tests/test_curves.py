"""Differential tests: vectorized curve ops vs the golden oracle, plus the
reference's known-answer vectors (secp 1g..10g table secp256k1.rs:149-180,
bls base point point.rs:15-18 with scalar_mul-vs-repeated-add point.rs:121-186).
"""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from bulletproofsplus_tpu.curves import CURVE_NAMES, curve_ops, golden_curve
from bulletproofsplus_tpu.msm import msm, scalar_mul, tree_sum


def sample_points(gc, k, seed):
    rng = random.Random(seed)
    g = gc.base()
    return [gc.mul(g, rng.randrange(1, gc.fn.p)) for _ in range(k)]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_point_roundtrip_and_identity(name):
    ops, gc = curve_ops(name), golden_curve(name)
    pts = [None, gc.base(), gc.dbl(gc.base())]
    enc = ops.encode_points(pts)
    assert ops.decode_points(enc) == pts
    ids = np.asarray(ops.is_identity(jnp.asarray(enc)))
    assert list(ids) == [True, False, False]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_add_dbl_neg(name):
    ops, gc = curve_ops(name), golden_curve(name)
    pts = sample_points(gc, 8, seed=10)
    P = jnp.asarray(ops.encode_points(pts))
    Q = jnp.asarray(ops.encode_points(pts[::-1]))

    got = ops.decode_points(ops.add(P, Q))
    want = [gc.add(a, b) for a, b in zip(pts, pts[::-1])]
    assert got == want

    assert ops.decode_points(ops.dbl(P)) == [gc.dbl(a) for a in pts]
    assert ops.decode_points(ops.neg(P)) == [gc.neg(a) for a in pts]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_add_special_cases(name):
    ops, gc = curve_ops(name), golden_curve(name)
    g = gc.base()
    g2 = gc.dbl(g)
    cases = [
        (None, g),       # identity + P
        (g, None),       # P + identity
        (None, None),    # identity + identity
        (g, g),          # doubling through add
        (g, gc.neg(g)),  # P + (-P) = identity
        (g2, gc.neg(g)), # generic
        (g2, g),         # generic
        (g, g2),         # generic
    ]
    P = jnp.asarray(ops.encode_points([c[0] for c in cases]))
    Q = jnp.asarray(ops.encode_points([c[1] for c in cases]))
    got = ops.decode_points(ops.add(P, Q))
    want = [gc.add(a, b) for a, b in cases]
    assert got == want
    assert list(np.asarray(ops.eq(P, Q))) == [
        False, False, True, True, False, False, False, False
    ]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_scalar_mul_small_table(name):
    """The reference's 1g..10g known-answer shape (secp256k1.rs:149-180)."""
    ops, gc = curve_ops(name), golden_curve(name)
    g = gc.base()
    ks = list(range(8))  # includes 0 → identity
    P = jnp.asarray(ops.encode_points([g] * len(ks)))
    s = jnp.asarray(ops.fn.encode_plain(ks))
    got = ops.decode_points(scalar_mul(ops, s, P, nbits=8))
    assert got == [gc.mul(g, k) for k in ks]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_scalar_mul_large_and_order(name):
    ops, gc = curve_ops(name), golden_curve(name)
    rng = random.Random(20)
    pts = sample_points(gc, 8, seed=21)
    ks = [rng.randrange(gc.fn.p) for _ in range(7)] + [gc.fn.p]  # order → identity
    P = jnp.asarray(ops.encode_points(pts))
    s = jnp.asarray(ops.fn.encode_plain(ks))
    got = ops.decode_points(scalar_mul(ops, s, P))
    assert got == [gc.mul(p_, k) for p_, k in zip(pts, ks)]


@pytest.mark.parametrize("name", CURVE_NAMES)
def test_tree_sum_and_msm(name):
    ops, gc = curve_ops(name), golden_curve(name)
    rng = random.Random(30)
    pts = sample_points(gc, 7, seed=31) + [None]  # include identity (batch 8)
    P = jnp.asarray(ops.encode_points(pts))
    assert ops.decode_point(tree_sum(ops, P)) == gc.sum(pts)

    ks = [rng.randrange(gc.fn.p) for _ in pts[:-1]] + [0]
    s = jnp.asarray(ops.fn.encode_plain(ks))
    assert ops.decode_point(msm(ops, s, P)) == gc.msm(ks, pts)
