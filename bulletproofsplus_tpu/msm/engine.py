"""Multi-scalar multiplication engines.

Replaces the reference's MulVec (src/bls12_381/building_block/mulvec.rs:20-33
and its duplicate at src/secp256k1/building_block/secp256k1/util.rs:22-36),
which computes k full scalar-muls plus k adds one element at a time. Here the
whole MSM is an array program: every point performs its double-and-add rounds
in lockstep across the batch (one fused VPU pass per round), and the final
accumulation is a balanced tree of vectorized point adds.

Shape discipline: batch sizes are padded to the next power of two (identity
points / zero scalars) so every tree level and scan body is one of log2(N)
canonical shapes — compiled once per session and shared by every MSM, every
WIP round, and every proof size (compile time would otherwise scale with the
number of distinct sizes).

`msm` / `scalar_mul` take PLAIN-form (non-Montgomery) scalar limb arrays over
the curve's scalar field and (..., C, L) point limb tensors.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pad_pow2(curve, scalars, points):
    """Pad batch axis to a power of two with zero scalars / identity points."""
    n = points.shape[0]
    n2 = _next_pow2(n)
    if n2 == n:
        return scalars, points
    pad_s = jnp.zeros((n2 - n, scalars.shape[-1]), jnp.int32)
    pad_p = curve.identity_like((n2 - n,))
    return (
        jnp.concatenate([scalars, pad_s], axis=0),
        jnp.concatenate([points, pad_p], axis=0),
    )


@functools.lru_cache(maxsize=None)
def _scalar_mul_jit(curve, nbits: int):
    def f(scalars, points):
        fn = curve.fn
        bits = fn.scalar_bits(scalars, nbits)  # (..., nbits) LSB-first
        bits_scan = jnp.moveaxis(bits, -1, 0)[::-1]  # (nbits, ...) MSB-first
        acc0 = curve.identity_like(points.shape[:-2])
        ident = curve.identity_like(points.shape[:-2])

        def body(acc, bit):
            # complete formulas: adding the identity is a no-op, so select
            # the ADDEND (cheap) instead of the add result
            acc = curve.dbl(acc)
            addend = curve.select(bit.astype(bool), points, ident)
            return curve.add(acc, addend), None

        acc, _ = lax.scan(body, acc0, bits_scan)
        return acc

    return jax.jit(f)


def scalar_mul(curve, scalars, points, nbits: int | None = None):
    """Batched double-and-add: out[i] = scalars[i] · points[i].

    scalars: plain-form (..., Ls) limbs (or (Ls,) broadcast over points);
    points: (..., C, L). nbits caps the scalar bit-width (default: full field).
    """
    nbits = nbits or curve.fn.L * 12
    return _scalar_mul_jit(curve, nbits)(scalars, points)


@functools.lru_cache(maxsize=None)
def _tree_sum_jit(curve):
    def f(points):  # points: (2^k, C, L)
        n = points.shape[0]
        while n > 1:
            points = curve.add(points[: n // 2], points[n // 2 :])
            n //= 2
        return points[0]

    return jax.jit(f)


def tree_sum(curve, points):
    """Σ points over axis 0 via a balanced tree of vectorized adds."""
    n = points.shape[0]
    if n == 0:
        return jnp.asarray(curve.identity_np)
    n2 = _next_pow2(n)
    if n2 != n:
        points = jnp.concatenate(
            [points, curve.identity_like((n2 - n,))], axis=0
        )
    return _tree_sum_jit(curve)(points)


@functools.lru_cache(maxsize=None)
def _msm_jit(curve, nbits: int):
    sm = _scalar_mul_jit(curve, nbits)
    ts = _tree_sum_jit(curve)

    def f(scalars, points):
        return ts(sm(scalars, points))

    return jax.jit(f)


def msm(curve, scalars, points, nbits: int | None = None):
    """Σ scalars[i] · points[i] (MulVec::calculate semantics, vectorized)."""
    nbits = nbits or curve.fn.L * 12
    scalars, points = _pad_pow2(curve, jnp.asarray(scalars), jnp.asarray(points))
    return _msm_jit(curve, nbits)(scalars, points)
