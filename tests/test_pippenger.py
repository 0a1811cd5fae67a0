"""Pippenger bucket MSM: differential equality with the windowed ladder.

The bucket engine replaces the reference's naive MulVec
(src/bls12_381/building_block/mulvec.rs:20-33) for large variable-base
MSMs; it must agree with msm/engine.py on every curve. Scalar widths are
bounded (64-bit) to keep the XLA:CPU compile of the scatter-scan program
CI-sized — the digit/bucket logic is width-uniform, so narrow scalars
exercise every code path (multi-window Horner, bucket-0 drop, padding,
batched rows).
"""
import random

import jax.numpy as jnp
import pytest

from bulletproofsplus_tpu.curves import curve_ops
from bulletproofsplus_tpu.curves.instances import base_point
from bulletproofsplus_tpu.msm.engine import msm, scalar_mul
from bulletproofsplus_tpu.msm.pippenger import msm_pippenger

NB = 64  # scalar bit-width under test


def _inputs(curve, N, seed=7):
    rnd = random.Random(seed)
    fn = curve.fn
    ss = [rnd.getrandbits(NB) for _ in range(N)]
    ss[0] = 0          # zero scalar lane → bucket 0 → dropped
    ss[1] = (1 << NB) - 1
    base = jnp.asarray(curve.encode_point(base_point(curve.name)))
    ks = [rnd.getrandbits(16) | 1 for _ in range(N)]
    pts = scalar_mul(
        curve, jnp.asarray(fn.encode_plain(ks)),
        jnp.broadcast_to(base, (N, *base.shape)), nbits=16)
    return jnp.asarray(fn.encode_plain(ss)), pts


@pytest.mark.parametrize("curve_name", ["edwards25519", "secp256k1"])
def test_pippenger_matches_ladder(curve_name):
    curve = curve_ops(curve_name)
    sc, pts = _inputs(curve, 70)
    a = msm(curve, sc, pts, nbits=NB)
    b = msm_pippenger(curve, sc, pts, nbits=NB)
    assert curve.decode_point(a) == curve.decode_point(b)


def test_pippenger_batched_rows():
    curve = curve_ops("edwards25519")
    sc, pts = _inputs(curve, 64, seed=11)
    sc2 = sc.reshape(2, 32, -1)
    pts2 = pts.reshape(2, 32, *pts.shape[-2:])
    a = msm(curve, sc2, pts2, nbits=NB)
    b = msm_pippenger(curve, sc2, pts2, nbits=NB)
    for i in range(2):
        assert curve.decode_point(a[i]) == curve.decode_point(b[i])


def test_pippenger_identity_msm():
    """k·G + k·(−G) per pair → the identity (a real verification shape)."""
    curve = curve_ops("edwards25519")
    fn = curve.fn
    base = jnp.asarray(curve.encode_point(base_point(curve.name)))
    neg = curve.neg(base)
    N = 40
    pts = jnp.stack([base, neg] * (N // 2))
    ks = [i // 2 + 1 for i in range(N)]
    out = msm_pippenger(
        curve, jnp.asarray(fn.encode_plain(ks)), pts, nbits=16)
    assert bool(curve.is_identity(out))
