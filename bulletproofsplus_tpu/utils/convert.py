"""Host-side conversions between Python ints and limb arrays.

The TPU compute path represents a field element as a little-endian vector of
W-bit limbs stored in int32 (W=12 by default, chosen so that limb products and
column sums of schoolbook multiplication stay below 2^31 with no hi/lo
splitting — see fields/spec.py). These helpers run on host (numpy) and are
used at data boundaries only (witness prep, serialization, tests).
"""
from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np


def int_to_limbs(x: int, num_limbs: int, width: int = 12) -> np.ndarray:
    """Little-endian W-bit limb decomposition of a nonnegative int.

    dtype is int32 for widths that keep schoolbook products in int32
    (W <= 15), int64 otherwise (the CPU-backend 24-bit layout)."""
    if x < 0:
        raise ValueError("int_to_limbs requires a nonnegative integer")
    mask = (1 << width) - 1
    out = np.empty(num_limbs, dtype=np.int32 if width <= 15 else np.int64)
    for i in range(num_limbs):
        out[i] = x & mask
        x >>= width
    if x != 0:
        raise ValueError("integer does not fit in the given number of limbs")
    return out


def ints_to_limbs(xs: Sequence[int], num_limbs: int, width: int = 12) -> np.ndarray:
    """(N, L) limb array from a sequence of nonnegative ints."""
    return np.stack([int_to_limbs(x, num_limbs, width) for x in xs], axis=0)


def limbs_to_int(limbs, width: int = 12) -> int:
    """Python int from a 1-D little-endian limb vector."""
    arr = np.asarray(limbs)
    x = 0
    for i in range(arr.shape[-1] - 1, -1, -1):
        x = (x << width) | int(arr[i])
    return x


def limbs_to_ints(limbs, width: int = 12) -> List[int]:
    """List of ints from an (N, L) limb array."""
    arr = np.asarray(limbs)
    return [limbs_to_int(arr[i], width) for i in range(arr.shape[0])]
