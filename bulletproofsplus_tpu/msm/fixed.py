"""Fixed-base MSM via precomputed window tables (BGMW-style).

The verification mega-MSM is dominated by FIXED generator lanes: for a single
aggregated proof the MSM is {A, A_wip, B, g, h, L_vec, R_vec, G_vec, H_vec,
V_vec} (reference range/mod.rs:479-503) — 2mn of ~2mn+2·log2(mn)+m+5 lanes
are the pk's G_vec/H_vec, which never change across proofs. The windowed
ladder (msm/engine.py) spends ~order_bits sequential doublings per lane; for
fixed bases those doublings can be hoisted into a one-time table

    T[k, j, i] = k · (2^(c·j) · P_i)    k ∈ [0, 2^c), j ∈ [0, nwin)

after which every MSM over the fixed lanes is pure lookups + one balanced
tree of point adds:

    Σᵢ sᵢ·Pᵢ = Σᵢ Σⱼ T[d_ij, j, i]      (d_ij = j-th c-bit digit of sᵢ)

Per-lane sequential point ops drop from ~order_bits dbl + nwin add (≈ 317 at
c = 4, 253-bit scalars) to nwin lookup-adds (64) — ~5× less VPU work, traded
for 2^c · nwin · N table points of HBM (≈ 0.7 GB for 2mn = 2048 ed25519
lanes) that stream through the branchless select tree once per MSM.

Table layout is entry-major (2^c, nwin, N, C, L): the lookup select-tree
halves axis 0, so slices stay contiguous and no transpose of the big array
is ever materialized.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

from .engine import _next_pow2, _pad_axis, _tree_sum_jit

WINDOW = 4  # c; must divide the limb width (12-bit TPU / 24-bit CPU lanes)


def fixed_base_enabled() -> bool:
    """Fixed-base tables pay when MSMs repeat over one pk (serving); they are
    on by default on TPU and opt-in elsewhere (BPP_FIXED_BASE=1/0)."""
    env = os.environ.get("BPP_FIXED_BASE")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "tpu"


def table_bytes(curve, n_points: int, nbits: int | None = None) -> int:
    """HBM footprint of the window table for n_points fixed bases."""
    nbits = nbits or curve.fn.order_bits
    nwin = -(-nbits // WINDOW)
    C = getattr(curve, "COORDS", 3)
    lane_bytes = 4 if curve.fp.W <= 15 else 8  # int32 / int64 limb lanes
    return (1 << WINDOW) * nwin * n_points * C * curve.fp.L * lane_bytes


def fixed_base_ok(curve, n_points: int) -> bool:
    """fixed_base_enabled AND the table fits the memory budget. The table is
    2^c·nwin·N points — e.g. 0.8 GB for 2048 ed25519 lanes but >2 TB for
    bls12-381 at mn=16384 (BASELINE config 4) — so large generator sets must
    fall back to the ladder. Budget override: BPP_FIXED_BASE_MAX_BYTES."""
    if not fixed_base_enabled():
        return False
    budget = int(os.environ.get("BPP_FIXED_BASE_MAX_BYTES",
                                str(6 * 1024**3)))
    return table_bytes(curve, n_points) <= budget


@functools.lru_cache(maxsize=None)
def _precompute_jit(curve, nbits: int):
    c = WINDOW
    nwin = -(-nbits // c)

    def f(points):  # (N, C, L) → (2^c, nwin, N, C, L)
        # chain[j] = 2^(c·j)·P : scan of c doublings per step
        def dbl_step(acc, _):
            return curve.dbl(acc), None

        def chain_step(carry, _):
            nxt, _ = lax.scan(dbl_step, carry, None, length=c)
            return nxt, carry

        _, Q = lax.scan(chain_step, points, None, length=nwin)
        # digit multiples: T[k] = k·Q, one vectorized add per k over all
        # (nwin, N) lanes at once
        ident = curve.identity_like(Q.shape[:-2])

        def tstep(acc, _):
            return curve.add(acc, Q), acc

        _, T = lax.scan(tstep, ident, None, length=1 << c)
        return T  # (2^c, nwin, N, C, L)

    return jax.jit(f)


def precompute_tables(curve, points, nbits: int | None = None):
    """Build the window table for fixed base points (N, C, L).

    Returns (2^c, nwin, N, C, L) limb tensor. One-time cost: nwin·c
    vectorized doublings over N lanes + 2^c vectorized adds over nwin·N
    lanes — roughly the point work of ~2 MSMs over those lanes."""
    nbits = nbits or curve.fn.order_bits
    return _precompute_jit(curve, nbits)(jnp.asarray(points))


def _fixed_lookup(curve, table, digits_t):
    """table: (2^c, nwin, N, C, L); digits_t: (nwin, N) int32 →
    (nwin, N, C, L) selected entries (branchless select tree over axis 0)."""
    c = table.shape[0].bit_length() - 1
    for level in range(c - 1, -1, -1):
        half = 1 << level
        bit = ((digits_t >> level) & 1).astype(bool)
        # mask (nwin, N) broadcasts against the (half, nwin, N, C, L) slices
        table = curve.select(bit, table[half:], table[:half])
    return table[0]


@functools.lru_cache(maxsize=None)
def _fixed_msm_jit(curve, nbits: int):
    c = WINDOW
    nwin = -(-nbits // c)
    ts = _tree_sum_jit(curve)

    def f(scalars, table):  # scalars plain (N, Ls); table (2^c, nwin, N, C, L)
        fn = curve.fn
        digits = fn.scalar_digits(scalars, nwin * c, c)  # (N, nwin) LSB-first
        sel = _fixed_lookup(curve, table, digits.T)      # (nwin, N, C, L)
        flat = sel.reshape(-1, *sel.shape[-2:])
        flat = _pad_axis(flat, 0, _next_pow2(flat.shape[0]),
                         jnp.asarray(curve.identity_np))
        return ts(flat)

    return jax.jit(f)


def fixed_msm(curve, scalars, table, nbits: int | None = None):
    """Σᵢ scalars[i]·Pᵢ over the precomputed table's base points.

    scalars: plain-form (N, Ls) limbs; table from precompute_tables (5D XLA
    layout) or fixed_table_kernel_layout (2D — dispatches to the Pallas
    lookup-accumulate kernel, which streams the table through VMEM once
    instead of materializing the select-tree levels in HBM)."""
    nbits = nbits or curve.fn.order_bits
    from ..utils.metrics import METRICS

    METRICS.msm_ops(int(scalars.shape[0]), nbits, "fixed")
    if table.ndim == 2:
        from ..curves.pallas_curve import fixed_msm_kernel

        return fixed_msm_kernel(curve, scalars, table, nbits)
    return _fixed_msm_jit(curve, nbits)(scalars, table)
