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


def table_bytes(curve, n_points: int, nbits: int | None = None,
                signed: bool = False) -> int:
    """HBM footprint of the window table for n_points fixed bases."""
    nbits = nbits or curve.fn.order_bits
    if signed:
        nent = 1 << (WINDOW - 1)
        nwin = curve.fn.signed_window_count(nbits, WINDOW)
    else:
        nent = 1 << WINDOW
        nwin = -(-nbits // WINDOW)
    C = getattr(curve, "COORDS", 3)
    lane_bytes = 4 if curve.fp.W <= 15 else 8  # int32 / int64 limb lanes
    return nent * nwin * n_points * C * curve.fp.L * lane_bytes


def _budget() -> int:
    return int(os.environ.get("BPP_FIXED_BASE_MAX_BYTES",
                              str(7 * 1024**3)))


def fixed_base_mode(curve, n_points: int):
    """Which table flavor fits the memory budget: "unsigned" (entries
    k ∈ [0, 2^c), digit = direct index), "signed" (entries k ∈ [1, 2^(c-1)]
    — HALF the table; digits balanced-recoded, sign by point negation,
    zero by identity select) or None (fall back to the ladder). Unsigned is
    preferred when both fit (one fewer select per lookup); signed unlocks
    e.g. bls12-381 at 2mn = 32768 (BASELINE config 4: 12.9 GB unsigned →
    6.4 GB signed). Budget override: BPP_FIXED_BASE_MAX_BYTES."""
    if not fixed_base_enabled():
        return None
    if table_bytes(curve, n_points) <= _budget():
        return "unsigned"
    if table_bytes(curve, n_points, signed=True) <= _budget():
        return "signed"
    return None


def fixed_base_ok(curve, n_points: int) -> bool:
    """fixed_base_enabled AND a table flavor fits the memory budget."""
    return fixed_base_mode(curve, n_points) is not None


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


@functools.lru_cache(maxsize=None)
def _precompute_signed_jit(curve, nbits: int):
    c = WINDOW
    nwin = curve.fn.signed_window_count(nbits, c)
    half = 1 << (c - 1)

    def f(points):  # (N, C, L) → (2^(c-1), nwin, N, C, L); entry j = (j+1)·Q
        def dbl_step(acc, _):
            return curve.dbl(acc), None

        def chain_step(carry, _):
            nxt, _ = lax.scan(dbl_step, carry, None, length=c)
            return nxt, carry

        _, Q = lax.scan(chain_step, points, None, length=nwin)

        def tstep(acc, _):
            return curve.add(acc, Q), acc

        last, T = lax.scan(tstep, Q, None, length=half - 1)
        return jnp.concatenate([T, last[None]], axis=0)

    return jax.jit(f)


def precompute_tables_signed(curve, points, nbits: int | None = None):
    """Signed-digit window table: entry [k-1, j, i] = k·2^(c·j)·P_i for
    k ∈ [1, 2^(c-1)] — HALF the unsigned table (negative digits negate the
    selected point; digit 0 selects the identity at lookup time)."""
    nbits = nbits or curve.fn.order_bits
    return _precompute_signed_jit(curve, nbits)(jnp.asarray(points))


@functools.lru_cache(maxsize=None)
def _fixed_msm_signed_jit(curve, nbits: int):
    c = WINDOW
    fn = curve.fn
    nwin = fn.signed_window_count(nbits, c)
    ts = _tree_sum_jit(curve)

    def f(scalars, table):  # (N, Ls); (2^(c-1), nwin, N, C, L)
        mag, neg = fn.scalar_digits_signed(scalars, nbits, c)  # (N, nwin)
        idx = jnp.maximum(mag, 1) - 1
        sel = _fixed_lookup(curve, table, idx.T)     # (nwin, N, C, L)
        sel = curve.select(neg.T, curve.neg(sel), sel)
        ident = jnp.asarray(curve.identity_np).astype(sel.dtype)
        sel = curve.select((mag.T == 0), jnp.broadcast_to(ident, sel.shape),
                           sel)
        flat = sel.reshape(-1, *sel.shape[-2:])
        flat = _pad_axis(flat, 0, _next_pow2(flat.shape[0]),
                         jnp.asarray(curve.identity_np))
        return ts(flat)

    return jax.jit(f)


def fixed_msm(curve, scalars, table, nbits: int | None = None):
    """Σᵢ scalars[i]·Pᵢ over the precomputed table's base points.

    scalars: plain-form (N, Ls) limbs; table from precompute_tables (5D XLA
    layout, 2^c or 2^(c-1) entries — signed tables detected by the entry
    count) or fixed_table_kernel_layout (2D — dispatches to the Pallas
    lookup-accumulate kernel, which streams the table through VMEM once
    instead of materializing the select-tree levels in HBM), or a tuple of
    2D chunk tables (point-axis chunks of one logical table, each evaluated
    by its own kernel pass — bounds build/layout peak memory for the
    multi-GB bls tables)."""
    nbits = nbits or curve.fn.order_bits
    from ..utils.metrics import METRICS

    if isinstance(table, (tuple, list)):
        from ..curves.pallas_curve import fixed_msm_kernel
        from .engine import tree_sum

        N = scalars.shape[0]
        nchunks = len(table)
        cn = -(-N // nchunks)
        METRICS.msm_ops(N, nbits, "fixed")
        parts = [
            fixed_msm_kernel(curve, scalars[i * cn: (i + 1) * cn], t2,
                             nbits, signed=_is_signed_2d(curve, t2, nbits))
            for i, t2 in enumerate(table)
        ]
        return tree_sum(curve, jnp.stack(parts))
    METRICS.msm_ops(int(scalars.shape[0]), nbits, "fixed")
    if table.ndim == 2:
        from ..curves.pallas_curve import fixed_msm_kernel

        return fixed_msm_kernel(curve, scalars, table, nbits,
                                signed=_is_signed_2d(curve, table, nbits))
    if table.shape[0] == (1 << (WINDOW - 1)):
        return _fixed_msm_signed_jit(curve, nbits)(scalars, table)
    return _fixed_msm_jit(curve, nbits)(scalars, table)


def _is_signed_2d(curve, t2, nbits: int) -> bool:
    """Whether a 2D kernel-layout table holds signed (2^(c-1)) entries —
    the row count is nent·CCP, so the entry count falls out of the shape."""
    CC = getattr(curve, "COORDS", 3) * curve.fp.L
    CCP = -(-CC // 8) * 8
    nent = t2.shape[0] // CCP
    return nent == (1 << (WINDOW - 1))
