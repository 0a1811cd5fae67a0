"""Differential tests: TPU limb field ops vs the pure-Python golden oracle.

Mirrors the reference's field unit tests (bls prime_field_elem.rs:251-348,
secp field prime_field_elem.rs:485-1019) but sweeps all six moduli with
random vectors instead of hand-picked constants.
"""
import random

import numpy as np
import pytest

from bulletproofsplus_tpu.fields import ALL_SPECS, field_ops
from bulletproofsplus_tpu.golden.field import Fp

N = 17  # deliberately not a power of two

# Both limb layouts are correctness-critical: 12-bit/int32 is the TPU layout,
# 24-bit/int64 the CPU one. The full six-modulus sweep runs on the (fast)
# 24-bit layout; the 12-bit layout is covered on the widest modulus (bls fq,
# 32 limbs) and a 255-bit one.
W12_NAMES = ["bls12_381_fq", "ed25519_fl"]


def ops_for(name, w):
    return field_ops(ALL_SPECS[name].with_limb_bits(w))


def width_cases(names12=W12_NAMES):
    return [(n, 24) for n in sorted(ALL_SPECS)] + [(n, 12) for n in names12]


def rand_elems(p, n, seed):
    rng = random.Random(seed)
    # mix edge cases with random values
    base = [0, 1, 2, p - 1, p - 2, p // 2]
    return [x % p for x in base] + [rng.randrange(p) for _ in range(n - len(base))]


@pytest.mark.parametrize("name,w", width_cases())
def test_encode_decode_roundtrip(name, w):
    spec = ALL_SPECS[name]
    ops = ops_for(name, w)
    xs = rand_elems(spec.modulus, N, seed=1)
    arr = ops.encode(xs)
    assert ops.decode(arr) == xs
    arr_p = ops.encode_plain(xs)
    assert ops.decode_plain(arr_p) == xs


@pytest.mark.parametrize("name,w", width_cases())
def test_ring_ops(name, w):
    spec = ALL_SPECS[name]
    ops = ops_for(name, w)
    gold = Fp(spec.modulus, name)
    xs = rand_elems(spec.modulus, N, seed=2)
    ys = rand_elems(spec.modulus, N, seed=3)
    a, b = ops.encode(xs), ops.encode(ys)

    assert ops.decode(ops.add(a, b)) == [gold.add(x, y) for x, y in zip(xs, ys)]
    assert ops.decode(ops.sub(a, b)) == [gold.sub(x, y) for x, y in zip(xs, ys)]
    assert ops.decode(ops.neg(a)) == [gold.neg(x) for x in xs]
    assert ops.decode(ops.mul(a, b)) == [gold.mul(x, y) for x, y in zip(xs, ys)]
    assert ops.decode(ops.sqr(a)) == [gold.sqr(x) for x in xs]


@pytest.mark.parametrize("name,w", [
    ("bls12_381_fr", 24), ("secp256k1_fp", 24), ("ed25519_fp", 24),
    ("bls12_381_fq", 12),
])
def test_inv_and_pow(name, w):
    spec = ALL_SPECS[name]
    ops = ops_for(name, w)
    gold = Fp(spec.modulus, name)
    xs = [x for x in rand_elems(spec.modulus, 10, seed=4) if x != 0]
    a = ops.encode(xs)
    assert ops.decode(ops.inv(a)) == [gold.inv(x) for x in xs]
    # 3^10 = 59049, the reference's pow known-answer (prime_field_elem.rs:321-329)
    assert ops.decode(ops.pow_const(ops.encode(3), 10)) == 59049 % spec.modulus
    assert ops.decode(ops.pow_const(a, 7)) == [gold.pow(x, 7) for x in xs]
    assert ops.decode(ops.pow_const(a, 0)) == [1] * len(xs)


@pytest.mark.parametrize("name", ["bls12_381_fr", "ed25519_fl"])
def test_batch_invert(name):
    spec = ALL_SPECS[name]
    ops = ops_for(name, 24)
    gold = Fp(spec.modulus, name)
    xs = [x for x in rand_elems(spec.modulus, 13, seed=5) if x != 0]
    allinv_g, invs_g = gold.batch_invert(xs)
    allinv, invs = ops.batch_invert(ops.encode(xs))
    assert ops.decode(allinv) == allinv_g
    assert ops.decode(invs) == invs_g


@pytest.mark.parametrize("name", ["bls12_381_fr", "secp256k1_fn"])
def test_powers_and_sum(name):
    spec = ALL_SPECS[name]
    ops = ops_for(name, 24)
    gold = Fp(spec.modulus, name)
    x = 1234567890123456789
    p2 = ops.decode(ops.powers_type2(ops.encode(x), 9))
    assert p2 == [gold.pow(x, k) for k in range(1, 10)]
    p1 = ops.decode(ops.powers_type1(ops.encode(x), 9))
    assert p1 == [gold.pow(x, k) for k in range(9)]

    xs = rand_elems(spec.modulus, N, seed=6)
    assert ops.decode(ops.sum(ops.encode(xs))) == sum(xs) % spec.modulus


@pytest.mark.parametrize("w", [12, 24])
def test_scalar_bits_and_digits(w):
    ops = ops_for("ed25519_fl", w)
    x = 0b1011001110001111
    bits = np.asarray(ops.scalar_bits(ops.encode_plain(x)[None, :], 20))[0]
    assert list(bits) == [(x >> k) & 1 for k in range(20)]
    digs = np.asarray(ops.scalar_digits(ops.encode_plain(x)[None, :], 20, 4))[0]
    assert list(digs) == [(x >> (4 * k)) & 15 for k in range(5)]
