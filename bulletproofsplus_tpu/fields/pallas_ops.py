"""Fused Montgomery multiplication as a Pallas TPU kernel.

The XLA path (fields/ops.py) materializes the (N, L, L) partial-product
tensor of schoolbook multiplication between ops and keeps the limb axis
(L = 22 for 255-bit fields) on the 128-wide lane dimension — ~17% lane
utilization and HBM round-trips for every intermediate. This kernel works
limb-major: a block of the batch is held VMEM-resident as (L, BN) with the
BATCH on the lane axis (100% lane utilization) and the limb axis on
sublanes; the schoolbook convolution is L shifted multiply-adds along
sublanes, and the whole chain (wide product → carry-normalize → separated
Montgomery reduction → conditional subtract) runs with no HBM traffic
beyond the (N, L) inputs and output.

Replaces the hot multiply behind the reference's mcl FFI
(src/bls12_381/building_block/scalar/prime_field_elem.rs:56-235) on the
actual hot path (curve adds/doublings inside MSMs). Kernel math mirrors
FieldOps exactly (same limb layout and bounds analysis); correctness is
differential-tested against it in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 512  # batch lanes per kernel instance (4 lane-tiles)


def _shift_down(x, i, total_rows):
    """Rows of x placed starting at row i of a (total_rows, BN) zero canvas.
    Mosaic has no scatter-add; shifted-concat adds lower to vector ops."""
    rows = x.shape[0]
    parts = []
    if i:
        parts.append(jnp.zeros((i, x.shape[1]), x.dtype))
    parts.append(x)
    tail = total_rows - i - rows
    if tail:
        parts.append(jnp.zeros((tail, x.shape[1]), x.dtype))
    return jnp.concatenate(parts, axis=0)


def _conv_full(a, b, L):
    """(L, BN) x (L, BN) → (2L, BN) schoolbook columns (limb-major)."""
    c = _shift_down(a[0:1, :] * b, 0, 2 * L)
    for i in range(1, L):
        c = c + _shift_down(a[i : i + 1, :] * b, i, 2 * L)
    return c


def _conv_low(a, b_col, L):
    """Low-L rows of the (L, BN) x (L, 1)const product (mod-R truncation:
    dropped high rows and dropped top-row carries ARE the mod-R semantics)."""
    c = a * b_col[0:1, :]
    for i in range(1, L):
        c = c + _shift_down(a[: L - i, :] * b_col[i : i + 1, :], i, L)
    return c


def _resolve(t, W, MASK):
    """Exact log-depth carry resolution along the limb (sublane) axis;
    same Kogge-Stone construction as FieldOps._resolve."""
    fm1 = (t - 1) >> W
    f0 = t >> W
    fp1 = (t + 1) >> W
    K = t.shape[0]
    s = 1
    while s < K:
        def shift(x, fill):
            return jnp.concatenate(
                [jnp.full_like(x[:s, :], fill), x[:-s, :]], axis=0
            )

        sm1, s0, sp1 = shift(fm1, -1), shift(f0, 0), shift(fp1, 1)

        def app(x):
            return jnp.where(x < 0, fm1, jnp.where(x == 0, f0, fp1))

        fm1, f0, fp1 = app(sm1), app(s0), app(sp1)
        s *= 2
    zero = jnp.zeros_like(f0[:1, :])
    c_in = jnp.concatenate([zero, f0[:-1, :]], axis=0)
    # final carry kept (1, BN): static slice (Mosaic has no dynamic_slice)
    return (t + c_in) & MASK, f0[K - 1 : K, :]


def _carry_norm(t, W, MASK):
    """Three halving passes + exact resolve (same bounds as FieldOps)."""
    for _ in range(3):
        hi = t >> W
        lo = t & MASK
        t = lo + jnp.concatenate(
            [jnp.zeros_like(hi[:1, :]), hi[:-1, :]], axis=0
        )
    out, _ = _resolve(t, W, MASK)
    return out


def _cond_sub_p(t, p_col, W, MASK):
    d, final = _resolve(t - p_col, W, MASK)
    return jnp.where(final == 0, d, t)


# ---------------------------------------------------------------------------
# Reusable limb-major field arithmetic (shared by the curve/MSM kernels in
# curves/pallas_curve.py). All values are (L, BN) canonical limb tensors.
# ---------------------------------------------------------------------------


class LimbMajorField:
    """Field ops over (L, BN) limb-major tensors inside a Pallas kernel.

    p_full / np_full are (L, BN) lane-broadcast constants (Mosaic cannot
    broadcast in sublanes and lanes at once)."""

    def __init__(self, spec, p_full, np_full):
        self.W = spec.limb_bits
        self.MASK = spec.mask
        self.L = spec.num_limbs
        self.p_full = p_full
        self.np_full = np_full

    def mul(self, a, b):
        W, MASK, L = self.W, self.MASK, self.L
        t = _carry_norm(_conv_full(a, b, L), W, MASK)
        m = _carry_norm(_conv_low(t[:L, :], self.np_full, L), W, MASK)
        s = t + _conv_full_2(m, self.p_full, L)
        s_n = _carry_norm(s, W, MASK)
        return _cond_sub_p(s_n[L:, :], self.p_full, W, MASK)

    def add(self, a, b):
        out, _ = _resolve(a + b, self.W, self.MASK)
        return _cond_sub_p(out, self.p_full, self.W, self.MASK)

    def sub(self, a, b):
        out, _ = _resolve(a - b + self.p_full, self.W, self.MASK)
        return _cond_sub_p(out, self.p_full, self.W, self.MASK)

    def neg(self, a):
        return self.sub(jnp.zeros_like(a), a)


def _conv_full_2(a, b, L):
    """Like _conv_full but b is a full (L, BN) tensor (constant or not)."""
    c = _shift_down(a[0:1, :] * b, 0, 2 * L)
    for i in range(1, L):
        c = c + _shift_down(a[i : i + 1, :] * b, i, 2 * L)
    return c


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec, interpret=False):
    from jax.experimental import pallas as pl

    W = spec.limb_bits
    MASK = spec.mask
    L = spec.num_limbs

    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        a = a_ref[...]          # (L, BN)
        b = b_ref[...]
        p_col = p_ref[...]      # (L, 1)
        np_col = np_ref[...]
        t = _carry_norm(_conv_full(a, b, L), W, MASK)   # (2L, BN) canonical
        m = _carry_norm(_conv_low(t[:L, :], np_col, L), W, MASK)
        s = t + _conv_full_2(m, p_col, L)
        s_n = _carry_norm(s, W, MASK)
        o_ref[...] = _cond_sub_p(s_n[L:, :], p_col, W, MASK)

    @jax.jit
    def run(a_t, b_t):  # (L, N) limb-major, N a multiple of BLOCK
        N = a_t.shape[1]
        # constants pre-broadcast along lanes: Mosaic cannot broadcast in
        # sublanes and lanes at once, so (1, BLOCK) rows broadcast cleanly
        p_full = jnp.broadcast_to(
            jnp.asarray(np.asarray(spec.p_limbs)[:, None]), (L, BLOCK)
        )
        np_full = jnp.broadcast_to(
            jnp.asarray(np.asarray(spec.nprime_limbs)[:, None]), (L, BLOCK)
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, N), a_t.dtype),
            grid=(N // BLOCK,),
            in_specs=[
                pl.BlockSpec((L, BLOCK), lambda i: (0, 0)),
                pl.BlockSpec((L, BLOCK), lambda i: (0, 0)),
                pl.BlockSpec((L, BLOCK), lambda i: (0, i)),
                pl.BlockSpec((L, BLOCK), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((L, BLOCK), lambda i: (0, i)),
            interpret=interpret,
        )(p_full, np_full, a_t, b_t)

    return run


def mont_mul(ops, a, b, interpret: bool = False):
    """Fused Montgomery product for (..., L) Montgomery-form limb arrays.

    Flattens leading axes, transposes to limb-major, pads the batch to a
    BLOCK multiple, runs the kernel, and restores shape/layout. The two
    transposes are (N, L) int32 copies — noise next to the fused chain."""
    L = ops.L
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape).reshape(-1, L)
    b = jnp.broadcast_to(b, shape).reshape(-1, L)
    N = a.shape[0]
    Np = -(-N // BLOCK) * BLOCK
    if Np != N:
        pad = jnp.zeros((Np - N, L), a.dtype)
        a = jnp.concatenate([a, pad], axis=0)
        b = jnp.concatenate([b, pad], axis=0)
    out_t = _mont_mul_call(ops.spec, interpret)(a.T, b.T)
    return out_t.T[:N].reshape(shape)
