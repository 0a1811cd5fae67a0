"""Differential tests for the fused limb-major Pallas Montgomery multiply
(fields/pallas_ops.py) in interpreter mode (runs on the CPU mesh; the same
kernel compiles via Mosaic on TPU — exercised by bench/profiling runs)."""
import random

import jax.numpy as jnp
import pytest

from bulletproofsplus_tpu.fields import ALL_SPECS, field_ops
from bulletproofsplus_tpu.fields.pallas_ops import BLOCK, mont_mul


@pytest.mark.parametrize("name", ["ed25519_fp", "bls12_381_fq"])
def test_mont_mul_matches_field_ops(name):
    spec = ALL_SPECS[name]  # 12-bit/int32 layout — the TPU kernel layout
    ops = field_ops(spec)
    p = spec.modulus
    rng = random.Random(9)
    xs = [rng.randrange(p) for _ in range(10)] + [0, 1, p - 1, p - 2]
    ys = [rng.randrange(p) for _ in range(10)] + [p - 1, 1, p - 1, 2]
    a, b = jnp.asarray(ops.encode(xs)), jnp.asarray(ops.encode(ys))
    got = mont_mul(ops, a, b, interpret=True)
    assert ops.decode(got) == [x * y % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1"])
def test_ladder_scalar_mul_matches_golden(name):
    """Whole-ladder MSM kernel vs the golden oracle, both point families
    (extended edwards + projective weierstrass), interpret mode. bls12-381
    exercises the same weierstrass path as secp256k1 (which additionally
    covers the padded table stride CCP != CC) and is validated on real TPU
    by bench runs; interpret-mode L=32 costs ~2 min per run, so it is
    omitted here."""
    from bulletproofsplus_tpu.curves import curve_ops, golden_curve
    from bulletproofsplus_tpu.curves.pallas_curve import ladder_scalar_mul

    curve = curve_ops(name)
    gc = golden_curve(name)
    rng = random.Random(11)
    nbits = 16  # 4 windows — keeps interpret-mode runtime small
    ks = [rng.randrange(1 << nbits) for _ in range(4)] + [0, 1]
    pts = [gc.mul(gc.base(), i + 2) for i in range(len(ks))]
    s = jnp.asarray(curve.fn.encode_plain(ks))
    P = jnp.asarray(curve.encode_points(pts))
    got = ladder_scalar_mul(curve, s, P, nbits, interpret=True)
    want = [gc.mul(p, k) for k, p in zip(ks, pts)]
    assert curve.decode_points(got) == want


def test_mont_mul_multi_block_and_broadcast():
    spec = ALL_SPECS["ed25519_fp"]
    ops = field_ops(spec)
    p = spec.modulus
    rng = random.Random(10)
    n = BLOCK + 3  # forces padding + a second grid step
    xs = [rng.randrange(p) for _ in range(n)]
    y = rng.randrange(p)
    a = jnp.asarray(ops.encode(xs))
    b = jnp.asarray(ops.encode(y))  # (L,) broadcast against (n, L)
    got = mont_mul(ops, a, b, interpret=True)
    assert ops.decode(got) == [x * y % p for x in xs]


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1"])
def test_fixed_msm_kernel_matches_golden(name):
    """Pallas fixed-base lookup-accumulate kernel vs the golden oracle and
    the XLA select-tree path, interpret mode (covers both point families,
    the lane-padding path, and the kernel-layout transform)."""
    from bulletproofsplus_tpu.curves import curve_ops, golden_curve
    from bulletproofsplus_tpu.curves.pallas_curve import (
        fixed_msm_kernel,
        fixed_table_kernel_layout,
    )
    from bulletproofsplus_tpu.msm.fixed import fixed_msm, precompute_tables

    curve = curve_ops(name)
    gc = golden_curve(name)
    rng = random.Random(13)
    nbits = 16  # 4 windows; N=6 pads the lane axis (24 -> BLOCK)
    N = 6
    ks = [rng.randrange(1 << nbits) for _ in range(N - 2)] + [0, 1]
    pts = [gc.mul(gc.base(), i + 2) for i in range(N)]
    s = jnp.asarray(curve.fn.encode_plain(ks))
    P = jnp.asarray(curve.encode_points(pts))
    table = precompute_tables(curve, P, nbits)
    tbl2 = fixed_table_kernel_layout(curve, table)
    got = fixed_msm_kernel(curve, s, tbl2, nbits, interpret=True)
    want_xla = fixed_msm(curve, s, table, nbits)
    want = None
    for k, p in zip(ks, pts):
        want = gc.add(want, gc.mul(p, k))
    assert curve.decode_point(got) == want
    assert curve.decode_point(want_xla) == want


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1"])
@pytest.mark.parametrize("jway", [2, 4])
def test_joint_ladder_grouped_matches_golden(name, jway):
    """J-way joint ladder kernel (groups of J pairs share their doublings)
    vs the golden oracle, both point families, interpret mode."""
    from bulletproofsplus_tpu.curves import curve_ops, golden_curve
    from bulletproofsplus_tpu.curves.pallas_curve import (
        joint_ladder_msm_grouped,
    )

    curve = curve_ops(name)
    gc = golden_curve(name)
    rng = random.Random(13)
    nbits = 16
    N = 2 * jway  # two groups
    ks = [rng.randrange(1 << nbits) for _ in range(N - 2)] + [0, 1]
    pts = [gc.mul(gc.base(), i + 3) for i in range(N)]
    s = jnp.asarray(curve.fn.encode_plain(ks))
    P = jnp.asarray(curve.encode_points(pts))
    got = joint_ladder_msm_grouped(curve, s, P, nbits, jway, interpret=True)
    want = []
    for g in range(N // jway):
        acc = None
        for j in range(jway):
            term = gc.mul(pts[g * jway + j], ks[g * jway + j])
            acc = gc.add(acc, term)
        want.append(acc)
    assert curve.decode_points(got) == want


def test_joint_ladder_grouped_two_lead_axes():
    """The K-batched prover calls the joint ladder with TWO leading axes
    ((K, 2, W) L/R rows — wip._wip_prove_known_kbatched_prog); cover that
    flattening (lead product not a multiple of anything convenient) in
    interpret mode."""
    from bulletproofsplus_tpu.curves import curve_ops, golden_curve
    from bulletproofsplus_tpu.curves.pallas_curve import (
        joint_ladder_msm_grouped,
    )

    curve = curve_ops("edwards25519")
    gc = golden_curve("edwards25519")
    rng = random.Random(17)
    nbits = 16
    K, R, W, jway = 3, 2, 8, 4
    ks = [rng.randrange(1 << nbits) for _ in range(K * R * W)]
    pts = [gc.mul(gc.base(), i + 3) for i in range(K * R * W)]
    s = jnp.asarray(curve.fn.encode_plain(ks)).reshape(K, R, W, -1)
    P0 = jnp.asarray(curve.encode_points(pts))
    P = P0.reshape(K, R, W, *P0.shape[-2:])
    got = joint_ladder_msm_grouped(curve, s, P, nbits, jway, interpret=True)
    assert got.shape[:3] == (K, R, W // jway)
    want = []
    for g in range(K * R * W // jway):
        acc = None
        for j in range(jway):
            acc = gc.add(acc, gc.mul(pts[g * jway + j], ks[g * jway + j]))
        want.append(acc)
    flat = got.reshape(-1, *got.shape[-2:])
    assert curve.decode_points(flat) == want


def test_sum_points_grouped_two_lead_axes():
    """tree_sum's grouped-kernel path with (K, R, W) inputs and a W that
    pads inside one block — the K-batched LR reduction shape."""
    from bulletproofsplus_tpu.curves import curve_ops, golden_curve
    from bulletproofsplus_tpu.curves.pallas_curve import sum_points_grouped

    curve = curve_ops("edwards25519")
    gc = golden_curve("edwards25519")
    K, R, W = 3, 2, 5
    pts = [gc.mul(gc.base(), i + 1) for i in range(K * R * W)]
    P0 = jnp.asarray(curve.encode_points(pts))
    P = P0.reshape(K, R, W, *P0.shape[-2:])
    got = sum_points_grouped(curve, P, interpret=True)
    assert got.shape[:2] == (K, R)
    want = []
    for g in range(K * R):
        acc = None
        for j in range(W):
            acc = gc.add(acc, pts[g * W + j])
        want.append(acc)
    assert curve.decode_points(got.reshape(-1, *got.shape[-2:])) == want


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1"])
def test_sum_points_grouped_matches_golden(name):
    """Grouped accumulate-reduce kernel (one pass + in-register rotate-add
    chain) vs the golden oracle, incl. identity pads and a leading group
    axis, interpret mode."""
    from bulletproofsplus_tpu.curves import curve_ops, golden_curve
    from bulletproofsplus_tpu.curves.pallas_curve import sum_points_grouped

    curve = curve_ops(name)
    gc = golden_curve(name)
    pts = [gc.mul(gc.base(), i + 1) for i in range(6)] + [None, None]
    P = jnp.asarray(curve.encode_points(pts)).reshape(2, 4, *jnp.asarray(
        curve.encode_points(pts)).shape[-2:])
    got = sum_points_grouped(curve, P, interpret=True)
    want = []
    for g in range(2):
        acc = None
        for j in range(4):
            acc = gc.add(acc, pts[g * 4 + j])
        want.append(acc)
    assert curve.decode_points(got) == want
