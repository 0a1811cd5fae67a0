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
import os

import jax
import jax.numpy as jnp
import numpy as np

# batch lanes per kernel instance (4 lane-tiles). Measured on the fused
# K=128 batch verify: 512 → 83.8 ms, 2048 → 104.2 ms — wider blocks lose
# (vmapped per-instance pads outweigh the smaller grid; per-step overhead
# is not the bottleneck), so 512 stays the default.
BLOCK = int(os.environ.get("BPP_MONTMUL_BLOCK", "512"))


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
# curves/pallas_curve.py). All values are (L, BN) limb tensors carried in a
# LazyVal wrapper that tracks STATIC bounds (value in units of p, per-limb
# min/max), enabling lazy reduction:
#
# - mul skips the two interior carry RESOLVES (mod-R truncation is exact for
#   any limb representation of the same value — value(t[:L]) ≡ T (mod R)
#   identically — so only cheap halving passes bound the limbs until the one
#   final exact resolve);
# - on curves with ≥ 8 bits of Montgomery headroom (R ≥ 2^8·p: ed25519,
#   secp256k1) mul also skips the final conditional subtraction (outputs
#   < 2p) and add/sub skip ALL normalization beyond (at most) one halving
#   pass — sub adds a k·p offset instead of conditionally reducing. The
#   bound tracker asserts T < p·R and int32 partial-product safety at trace
#   time, auto-inserting halving passes only where actually needed.
# - bls12-381 Fq has only 3 headroom bits (R = 2^384, p 381-bit), so it
#   keeps canonical outputs everywhere (lazy=False) but still gets the
#   interior-resolve skip.
# ---------------------------------------------------------------------------


class LazyVal:
    """A (L, BN) limb tensor + static bounds: value < pb·p, limbs in
    [lmin, lmax]. Bounds are Python ints resolved at trace time."""

    __slots__ = ("t", "pb", "lmin", "lmax")

    def __init__(self, t, pb: int, lmin: int, lmax: int):
        self.t = t
        self.pb = pb
        self.lmin = lmin
        self.lmax = lmax


def _halve_once(t, W, MASK):
    """One carry-halving pass (exact, value-preserving)."""
    hi = t >> W
    lo = t & MASK
    return lo + jnp.concatenate(
        [jnp.zeros_like(hi[:1, :]), hi[:-1, :]], axis=0
    )


class LimbMajorField:
    """Field ops over LazyVal (L, BN) limb-major tensors inside a Pallas
    kernel. p_full / np_full are (L, BN) lane-broadcast constants (Mosaic
    cannot broadcast in sublanes and lanes at once)."""

    def __init__(self, spec, p_full, np_full):
        self.W = spec.limb_bits
        self.MASK = spec.mask
        self.L = spec.num_limbs
        self.p_full = p_full
        self.np_full = np_full
        # Montgomery headroom in bits: R = 2^(W·L) vs the modulus
        self.headroom = self.W * self.L - spec.modulus.bit_length()
        self.lazy = self.headroom >= 8
        # partial-product column-sum capacity of the lane dtype (int32 for
        # the 12-bit TPU layout, int64 for the 24-bit CPU layout)
        self.acc_cap = (1 << 31) if self.W <= 15 else (1 << 63)
        # k·p offset constants, built EAGERLY at field-construction level:
        # lazily building them inside a lax.fori_loop body trace and reusing
        # the cached tensor from a sibling trace leaks tracers across traces
        # (pallas then rejects the kernel for "capturing constants")
        self._kp = {}  # k -> (tensor of k·p limbs, lmax)
        if self.lazy:
            for k in (1, 2, 4, 8, 16):
                self._kp_const(k)

    # -- bound utilities ----------------------------------------------------

    def wrap(self, t, pb: int, lmin: int = 0, lmax: int | None = None):
        return LazyVal(t, pb, lmin, self.MASK if lmax is None else lmax)

    def _halve(self, v: LazyVal) -> LazyVal:
        t = _halve_once(v.t, self.W, self.MASK)
        # lo in [0, MASK]; carry-in in [v.lmin >> W, v.lmax >> W]
        lmin = min(0, v.lmin >> self.W)
        lmax = self.MASK + (v.lmax >> self.W)
        return LazyVal(t, v.pb, lmin, lmax)

    def _fit_for_conv(self, a: LazyVal, b: LazyVal):
        """Halve operands until partial-product column sums fit the lane
        accumulator dtype."""
        def mag(v):
            return max(v.lmax, -v.lmin)

        while mag(a) * mag(b) * self.L >= self.acc_cap:
            if mag(a) <= self.MASK + 2 and mag(b) <= self.MASK + 2:
                raise AssertionError(
                    "conv accumulator too small for near-canonical limbs")
            a, b = (self._halve(a), b) if mag(a) >= mag(b) else (a, self._halve(b))
        return a, b

    def _kp_const(self, k: int):
        """k·p as a bounded limb tensor, computed once per kernel instance
        from the p constant (k ≤ 32: limbs ≤ 32·MASK, two halvings →
        near-canonical)."""
        got = self._kp.get(k)
        if got is None:
            t = self.p_full * k
            lmax = self.MASK * k
            for _ in range(2):
                if lmax <= self.MASK + 2:
                    break
                t = _halve_once(t, self.W, self.MASK)
                lmax = self.MASK + (lmax >> self.W)
            got = (t, lmax)
            self._kp[k] = got
        return got

    # -- core ops -----------------------------------------------------------

    def mul(self, a: LazyVal, b: LazyVal) -> LazyVal:
        W, MASK, L = self.W, self.MASK, self.L
        # inputs must be limb-NONNEGATIVE: a negative-limb representation of
        # the truncated low half t[:L] can make the REDC quotient (T+Mp)/R
        # negative, which the masked upper half would wrap mod R — not mod p
        # (sub() resolves to nonneg limbs for exactly this reason)
        assert a.lmin >= 0 and b.lmin >= 0, "mul needs nonneg limbs"
        a, b = self._fit_for_conv(a, b)
        # T < p·R keeps the REDC quotient in range; headroom bits bound pb·pb
        assert a.pb * b.pb <= (1 << self.headroom), (
            f"REDC overflow: pb {a.pb}*{b.pb} > 2^{self.headroom}")
        t = _conv_full(a.t, b.t, L)
        for _ in range(3):
            t = _halve_once(t, W, MASK)  # loose limbs: mod-R stays exact
        m = _conv_low(t[:L, :], self.np_full, L)
        for _ in range(3):
            m = _halve_once(m, W, MASK)
        s = t + _conv_full_2(m, self.p_full, L)
        s_n = _carry_norm(s, W, MASK)  # the ONE exact resolve
        out = s_n[L:, :]
        # out < T/R + p·(1 + ε) < 2p
        if self.lazy:
            return LazyVal(out, 2, 0, MASK)
        return LazyVal(_cond_sub_p(out, self.p_full, W, MASK), 1, 0, MASK)

    def add(self, a: LazyVal, b: LazyVal) -> LazyVal:
        out = LazyVal(a.t + b.t, a.pb + b.pb,
                      a.lmin + b.lmin, a.lmax + b.lmax)
        if not self.lazy:
            t, _ = _resolve(out.t, self.W, self.MASK)
            return LazyVal(
                _cond_sub_p(t, self.p_full, self.W, self.MASK),
                1, 0, self.MASK)
        return out

    def sub(self, a: LazyVal, b: LazyVal) -> LazyVal:
        if not self.lazy:
            t, _ = _resolve(a.t - b.t + self.p_full, self.W, self.MASK)
            return LazyVal(
                _cond_sub_p(t, self.p_full, self.W, self.MASK),
                1, 0, self.MASK)
        # a - b + k·p with k = next power of two ≥ b.pb keeps the VALUE ≥ 0;
        # one exact resolve makes the LIMBS ≥ 0 (required by mul, see there)
        # while still skipping the conditional subtraction
        k = 1 << max(0, (b.pb - 1).bit_length())
        kp, kp_lmax = self._kp_const(k)
        v = LazyVal(a.t - b.t + kp, a.pb + k,
                    a.lmin - b.lmax, a.lmax - b.lmin + kp_lmax)
        while v.lmax > (1 << (self.W + 1)) - 2 or v.lmin < -self.MASK:
            v = self._halve(v)
        t, _ = _resolve(v.t, self.W, self.MASK)
        return LazyVal(t, v.pb, 0, self.MASK)

    def neg(self, a: LazyVal) -> LazyVal:
        # derive zero from a traced value: a literal zeros_like would be
        # captured as a jaxpr constant, which pallas_call rejects
        z = LazyVal(a.t * 0, 0, 0, 0)
        return self.sub(z, a)

    # -- storage boundaries ---------------------------------------------------

    def store_norm(self, v: LazyVal, pb_store: int):
        """Normalize for storage in a ref: limbs nonneg near-canonical, pb
        within the store invariant (asserted — formulas must keep coords
        ≤ pb_store so loads can assume it)."""
        assert v.pb <= pb_store, f"stored pb {v.pb} > invariant {pb_store}"
        assert v.lmin >= 0, "stored limbs must be nonneg (mul precondition)"
        while v.lmax > self.MASK + 2:
            v = self._halve(v)
        return v.t

    def load(self, t, pb_store: int) -> LazyVal:
        return LazyVal(t, pb_store, 0, self.MASK + 2)

    def canon(self, v: LazyVal) -> LazyVal:
        """Exact canonical representative in [0, p) (kernel output)."""
        W, MASK = self.W, self.MASK
        # resolve is exact for limbs in [-MASK, 2^(W+1)-2] (carries stay in
        # {-1, 0, 1}); halving converges to lmax ≤ MASK+1, lmin ≥ -1
        while v.lmax > (1 << (W + 1)) - 2 or v.lmin < -MASK:
            v = self._halve(v)
        t, _ = _resolve(v.t, W, MASK)
        pb = v.pb
        k = 1
        while k * 2 < pb:
            k *= 2
        while k >= 1:  # conditional subtract k·p, halving k
            kp = self.p_full * k if k > 1 else self.p_full
            if k > 1:
                kp, _ = _resolve(
                    _halve_once(_halve_once(kp, W, MASK), W, MASK), W, MASK)
            d, fin = _resolve(t - kp, W, MASK)
            t = jnp.where(fin == 0, d, t)
            k //= 2
        return LazyVal(t, 1, 0, MASK)


def _conv_full_2(a, b, L):
    """Like _conv_full but b is a full (L, BN) tensor (constant or not)."""
    c = _shift_down(a[0:1, :] * b, 0, 2 * L)
    for i in range(1, L):
        c = c + _shift_down(a[i : i + 1, :] * b, i, 2 * L)
    return c


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec, block: int = None, interpret=False):
    from jax.experimental import pallas as pl

    BLOCK = block or globals()["BLOCK"]
    W = spec.limb_bits
    MASK = spec.mask
    L = spec.num_limbs

    def kernel(p_ref, np_ref, a_ref, b_ref, o_ref):
        a = a_ref[...]          # (L, BN)
        b = b_ref[...]
        p_col = p_ref[...]      # (L, 1)
        np_col = np_ref[...]
        # interior carry RESOLVES skipped: mod-R truncation is exact for any
        # limb representation of the same value (value(t[:L]) ≡ T mod R
        # identically), so cheap halving passes bound the limbs until the
        # one final exact resolve before taking the upper half
        t = _conv_full(a, b, L)
        for _ in range(3):
            t = _halve_once(t, W, MASK)
        m = _conv_low(t[:L, :], np_col, L)
        for _ in range(3):
            m = _halve_once(m, W, MASK)
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
    # block adapts downward for small batches (vmapped per-instance calls)
    # so padding never more than doubles the work; grid-step overhead makes
    # the widest fitting block the right choice for large batches
    block = BLOCK
    while block > 512 and block // 2 >= N:
        block //= 2
    Np = -(-N // block) * block
    if Np != N:
        pad = jnp.zeros((Np - N, L), a.dtype)
        a = jnp.concatenate([a, pad], axis=0)
        b = jnp.concatenate([b, pad], axis=0)
    out_t = _mont_mul_call(ops.spec, block, interpret)(a.T, b.T)
    return out_t.T[:N].reshape(shape)
