"""Vectorized modular arithmetic over limb arrays (the TPU field core).

A field element is a little-endian vector of W=12-bit limbs in int32; a batch
of N elements is an (N, L) array; all ops broadcast over leading axes. The
internal representation is Montgomery form (x·R mod p, R = 2^(W·L)); use
`encode`/`decode` at host boundaries.

This layer replaces the reference's per-element native field ops — mcl Fr/Fq
FFI calls (src/bls12_381/building_block/scalar/prime_field_elem.rs:56-235) and
the BigUint secp256k1 field (src/secp256k1/building_block/field/
prime_field_elem.rs:251-317) — with whole-array programs XLA can fuse and tile
onto the VPU. `batch_invert` uses the Montgomery trick via log-depth
associative scans (fixing the reference's naive per-element loop,
prime_field_elem.rs:239-248).
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..utils.convert import int_to_limbs, limbs_to_int
from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

W = LIMB_BITS
MASK = LIMB_MASK


def jit_method(*, static_argnums=()):
    """Per-instance jit cache for ops methods.

    Instances are long-lived singletons (see field_ops), so each method gets
    one jitted closure over `self`; without this, eager callers (tests, host
    glue) pay a full re-trace of the carry scans on every call. Inside an
    outer jit the wrapper is inlined at trace time, so protocol-level jits
    still fuse across ops.
    """

    def deco(fn):
        import functools as _ft

        @_ft.wraps(fn)
        def wrapper(self, *args, **kwargs):
            cache = self.__dict__.setdefault("_jit_cache", {})
            jitted = cache.get(fn.__name__)
            if jitted is None:
                jitted = jax.jit(
                    _ft.partial(fn, self),
                    static_argnums=tuple(i - 1 for i in static_argnums),
                )
                cache[fn.__name__] = jitted
            return jitted(*args, **kwargs)

        wrapper.__wrapped_raw__ = fn
        return wrapper

    return deco


class FieldOps:
    """Montgomery-form vectorized ops for one prime field.

    Instances are static (hashable) closures over numpy constants; methods are
    pure jnp functions safe to call under jit/vmap/shard_map.
    """

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.L = spec.num_limbs
        self.p = spec.modulus
        self.p_arr = spec.p_limbs  # (L,) np.int32
        self.p0 = int(spec.p_limbs[0])
        self.p_rest = spec.p_limbs[1:]  # (L-1,)
        self.n0inv = spec.n0inv
        self.r_mod_p = spec.r_mod_p
        self.r2_arr = int_to_limbs(spec.r2_mod_p, self.L)
        self.one_np = int_to_limbs(spec.r_mod_p, self.L)  # 1 in Montgomery form
        self.zero_np = np.zeros(self.L, dtype=np.int32)
        # bit extraction tables for W-bit limbs
        nbits = self.L * W
        self._bit_limb = np.arange(nbits, dtype=np.int32) // W
        self._bit_shift = np.arange(nbits, dtype=np.int32) % W

    # ------------------------------------------------------------------
    # host-side encode / decode
    # ------------------------------------------------------------------

    def encode(self, x: Union[int, Sequence[int]]) -> np.ndarray:
        """Python int(s) → Montgomery-form limb array ((L,) or (N, L))."""
        if isinstance(x, (int, np.integer)):
            return int_to_limbs((int(x) % self.p) * self.r_mod_p % self.p, self.L)
        return np.stack([self.encode(int(v)) for v in x], axis=0)

    def decode(self, arr) -> Union[int, List[int]]:
        """Montgomery-form limb array → Python int(s)."""
        a = np.asarray(arr)
        rinv = pow(self.r_mod_p, -1, self.p)
        if a.ndim == 1:
            return limbs_to_int(a) * rinv % self.p
        return [limbs_to_int(a[i]) * rinv % self.p for i in range(a.shape[0])]

    def encode_plain(self, x: Union[int, Sequence[int]]) -> np.ndarray:
        """Int(s) → plain (non-Montgomery) limb array, e.g. MSM scalars."""
        if isinstance(x, (int, np.integer)):
            return int_to_limbs(int(x) % self.p, self.L)
        return np.stack([self.encode_plain(int(v)) for v in x], axis=0)

    def decode_plain(self, arr) -> Union[int, List[int]]:
        a = np.asarray(arr)
        if a.ndim == 1:
            return limbs_to_int(a)
        return [limbs_to_int(a[i]) for i in range(a.shape[0])]

    # ------------------------------------------------------------------
    # carry handling
    # ------------------------------------------------------------------

    def _carry_norm(self, t):
        """Exact carry propagation → canonical W-bit limbs.

        Accepts limbs in (-2^12, 2^30); the represented value must be
        nonnegative and fit in t.shape[-1] limbs (final carry is zero by
        construction at every call site).
        """
        tm = jnp.moveaxis(t, -1, 0)

        def step(c, x):
            v = x + c
            return v >> W, v & MASK

        _, out = lax.scan(step, jnp.zeros(t.shape[:-1], jnp.int32), tm)
        return jnp.moveaxis(out, 0, -1)

    def _cond_sub_p(self, t):
        """t in [0, 2p), canonical limbs → t mod p."""
        d = jnp.moveaxis(t - self.p_arr, -1, 0)

        def step(b, x):
            v = x - b
            return (v < 0).astype(jnp.int32), v & MASK

        borrow, dm = lax.scan(step, jnp.zeros(t.shape[:-1], jnp.int32), d)
        dsub = jnp.moveaxis(dm, 0, -1)
        return jnp.where((borrow == 0)[..., None], dsub, t)

    # ------------------------------------------------------------------
    # ring ops
    # ------------------------------------------------------------------

    @jit_method()
    def add(self, a, b):
        return self._cond_sub_p(self._carry_norm(a + b))

    @jit_method()
    def sub(self, a, b):
        return self._cond_sub_p(self._carry_norm(a - b + self.p_arr))

    @jit_method()
    def neg(self, a):
        return self._cond_sub_p(self._carry_norm(self.p_arr - a))

    def _mul_wide(self, a, b):
        """Schoolbook product → (..., 2L) columns (un-normalized, < 2^29)."""
        L = self.L
        o = a[..., :, None] * b[..., None, :]  # (..., L, L), products < 2^24
        # Shear trick: pad rows to 2L, flatten, reinterpret at width 2L-1 so
        # row i lands shifted right by i; column sums are then the
        # anti-diagonal (base-2^W column) sums.
        o = jnp.concatenate([o, jnp.zeros_like(o)], axis=-1)  # (..., L, 2L)
        lead = o.shape[:-2]
        flat = o.reshape(*lead, 2 * L * L)
        sheared = flat[..., : L * (2 * L - 1)].reshape(*lead, L, 2 * L - 1)
        cols = sheared.sum(axis=-2)  # (..., 2L-1)
        return jnp.concatenate(
            [cols, jnp.zeros((*lead, 1), jnp.int32)], axis=-1
        )  # (..., 2L)

    def _redc(self, t):
        """Montgomery reduction of (..., 2L) columns with value < p·R → (..., L), < p."""
        L = self.L
        c = jnp.zeros(t.shape[:-1], jnp.int32)
        for i in range(L):
            v = t[..., i] + c
            m = ((v & MASK) * self.n0inv) & MASK
            u = v + m * self.p0
            c = u >> W
            t = t.at[..., i + 1 : i + L].add(m[..., None] * self.p_rest)
        res = t[..., L:].at[..., 0].add(c)
        return self._cond_sub_p(self._carry_norm(res))

    @jit_method()
    def mul(self, a, b):
        return self._redc(self._mul_wide(a, b))

    @jit_method()
    def sqr(self, a):
        return self.mul(a, a)

    # ------------------------------------------------------------------
    # powers and inverses
    # ------------------------------------------------------------------

    @jit_method(static_argnums=(2,))
    def pow_const(self, a, e: int):
        """a^e for a static Python-int exponent (square-and-multiply scan)."""
        if e == 0:
            return jnp.broadcast_to(jnp.asarray(self.one_np), a.shape)
        bits = np.array(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.int32,
        )

        acc0 = jnp.broadcast_to(jnp.asarray(self.one_np), a.shape)

        def body(acc, bit):
            acc = self.mul(acc, acc)
            acc = jnp.where(bit.astype(bool), self.mul(acc, a), acc)
            return acc, None

        acc, _ = lax.scan(body, acc0, jnp.asarray(bits))
        return acc

    @jit_method()
    def inv(self, a):
        """Fermat inversion a^(p-2); a must be nonzero (as in the reference,
        mcl Fr::inv / secp safe_inv, prime_field_elem.rs:339-396)."""
        return self.pow_const(a, self.p - 2)

    @jit_method(static_argnums=(2,))
    def batch_invert(self, a, axis: int = 0):
        """(prod of all inverses, elementwise inverses) — Montgomery trick.

        Matches the reference's batch_invert return contract
        (bls prime_field_elem.rs:239-248) but runs one Fermat inversion plus
        two log-depth product scans instead of N inversions.
        """
        pre = lax.associative_scan(self.mul, a, axis=axis)
        total = lax.index_in_dim(pre, a.shape[axis] - 1, axis=axis, keepdims=False)
        allinv = self.inv(total)
        ones = jnp.broadcast_to(
            jnp.asarray(self.one_np),
            lax.slice_in_dim(a, 0, 1, axis=axis).shape,
        )
        pre_excl = lax.concatenate(
            [ones, lax.slice_in_dim(pre, 0, a.shape[axis] - 1, axis=axis)],
            dimension=axis % a.ndim,
        )
        suf = lax.associative_scan(self.mul, a, axis=axis, reverse=True)
        suf_excl = lax.concatenate(
            [lax.slice_in_dim(suf, 1, a.shape[axis], axis=axis), ones],
            dimension=axis % a.ndim,
        )
        invs = self.mul(self.mul(pre_excl, suf_excl), allinv)
        return allinv, invs

    @jit_method(static_argnums=(2,))
    def powers_type2(self, x, n: int):
        """[x, x^2, ..., x^n] as (n, L) (reference util.rs:34-37)."""
        xs = jnp.broadcast_to(x, (n, self.L))
        return lax.associative_scan(self.mul, xs, axis=0)

    @jit_method(static_argnums=(2,))
    def powers_type1(self, x, n: int):
        """[1, x, ..., x^(n-1)] as (n, L) (reference util.rs:29-32)."""
        if n == 1:
            return jnp.asarray(self.one_np)[None, :]
        p2 = self.powers_type2(x, n - 1)
        return jnp.concatenate([jnp.asarray(self.one_np)[None, :], p2], axis=0)

    @jit_method(static_argnums=(2,))
    def sum(self, a, axis: int = 0):
        """Field sum along an axis via balanced tree of exact adds."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        while n > 1:
            half = n // 2
            paired = self.add(a[:half], a[half : 2 * half])
            a = (
                jnp.concatenate([paired, a[2 * half :]], axis=0)
                if n % 2
                else paired
            )
            n = a.shape[0]
        return a[0]

    # ------------------------------------------------------------------
    # predicates / helpers
    # ------------------------------------------------------------------

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, mask, a, b):
        """mask ? a : b, mask shaped like a.shape[:-1] (or scalar)."""
        return jnp.where(jnp.asarray(mask)[..., None], a, b)

    def scalar_bits(self, s, nbits: int | None = None):
        """Plain-form limb scalars (..., L) → bits (..., nbits), LSB first."""
        nbits = nbits or self.L * W
        idx = self._bit_limb[:nbits]
        sh = self._bit_shift[:nbits]
        return (s[..., idx] >> sh) & 1

    def one_like(self, a):
        return jnp.broadcast_to(jnp.asarray(self.one_np), a.shape)

    def zero_like(self, a):
        return jnp.zeros_like(a)


@functools.lru_cache(maxsize=None)
def field_ops(spec: FieldSpec) -> FieldOps:
    return FieldOps(spec)
