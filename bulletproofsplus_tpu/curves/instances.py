"""The three curve backends behind one interface.

The reference hard-wires its proof layer to bls12-381 (range/mod.rs:10-15)
and leaves its secp256k1 stack orphaned (SURVEY.md §1); here every backend is
an instance of the same vectorized ops interface, selected by name.
"""
from __future__ import annotations

import functools

from ..fields import (
    BLS12_381_FQ,
    BLS12_381_FR,
    ED25519_FL,
    ED25519_FP,
    SECP256K1_FN,
    SECP256K1_FP,
    field_ops,
)
from ..golden import curves as golden_curves
from .edwards import EdwardsOps
from .weierstrass import WeierstrassOps


def default_limb_bits() -> int:
    """Limb layout by backend: 12-bit/int32 on TPU (VPU integer lanes),
    24-bit/int64 on CPU (4x fewer partial products; AVX-512 vpmullq).
    Override with BPP_LIMB_BITS."""
    import os

    env = os.environ.get("BPP_LIMB_BITS")
    if env:
        return int(env)
    import jax

    return 24 if jax.default_backend() == "cpu" else 12


@functools.lru_cache(maxsize=None)
def _curve_ops_at(name: str, limb_bits: int):
    def f(spec):
        return field_ops(spec.with_limb_bits(limb_bits))

    if name == "bls12_381":
        return WeierstrassOps(f(BLS12_381_FQ), f(BLS12_381_FR), b=4, name=name)
    if name == "secp256k1":
        return WeierstrassOps(f(SECP256K1_FP), f(SECP256K1_FN), b=7, name=name)
    if name == "edwards25519":
        return EdwardsOps(
            f(ED25519_FP), f(ED25519_FL), d=golden_curves.ED_D, name=name
        )
    raise ValueError(f"unknown curve {name!r}")


def curve_ops(name: str, limb_bits: int | None = None):
    """Vectorized curve backend by name: bls12_381 | secp256k1 | edwards25519."""
    return _curve_ops_at(name, limb_bits or default_limb_bits())


def golden_curve(name: str):
    """The matching pure-Python oracle curve."""
    return golden_curves.CURVES[name]


def base_point(name: str):
    """Affine generator (matches the reference's hardcoded base points:
    bls point.rs:15-18, secp secp256k1.rs:40-53)."""
    return golden_curves.CURVES[name].base()


CURVE_NAMES = ("bls12_381", "secp256k1", "edwards25519")
