"""Whole-ladder MSM kernel for edwards25519 (Pallas, limb-major).

One kernel instance runs the ENTIRE 4-bit windowed ladder for a block of
points: table build (15 adds), then ceil(nbits/4) windows of 4 doublings +
table select + add — all on VMEM-resident (rows, lanes) tensors with the
batch on the lane axis. HBM traffic per block is exactly: points + digits
in, accumulator out. This is the speed-of-light shape for the verifier's
single-MSM hot path (reference range/mod.rs:479-509): the XLA scan path
round-trips every intermediate through HBM (~937 ms for a (2,2048) MSM),
per-multiply Pallas cuts it to ~160 ms, and this kernel removes the
remaining inter-op traffic.

Point layout in-kernel: extended coordinates (X, Y, Z, T), each an
(L, BN) limb-major tensor (add-2008-hwcd-3 complete formulas, a = -1 —
same math as curves/edwards.py, differentially tested against it).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..fields.pallas_ops import LimbMajorField

BLOCK = 512   # lanes per kernel instance
WINDOW = 4


def _ewadd(f, P, Q, k2d):
    """add-2008-hwcd-3 (a=-1, complete) on (L, BN) coordinate tuples."""
    X1, Y1, Z1, T1 = P
    X2, Y2, Z2, T2 = Q
    A = f.mul(f.sub(Y1, X1), f.sub(Y2, X2))
    B = f.mul(f.add(Y1, X1), f.add(Y2, X2))
    C = f.mul(f.mul(T1, T2), k2d)
    D = f.mul(f.add(Z1, Z1), Z2)
    E = f.sub(B, A)
    F = f.sub(D, C)
    G = f.add(D, C)
    H = f.add(B, A)
    return (f.mul(E, F), f.mul(G, H), f.mul(F, G), f.mul(E, H))


def _ewdbl(f, P):
    """dbl-2008-hwcd (a=-1) on (L, BN) coordinate tuples."""
    X1, Y1, Z1, _ = P
    A = f.mul(X1, X1)
    B = f.mul(Y1, Y1)
    ZZ = f.mul(Z1, Z1)
    t = f.add(X1, Y1)
    t = f.mul(t, t)
    C = f.add(ZZ, ZZ)
    G = f.sub(B, A)
    E = f.sub(f.sub(t, A), B)
    F = f.sub(G, C)
    H = f.neg(f.add(A, B))
    return (f.mul(E, F), f.mul(G, H), f.mul(F, G), f.mul(E, H))


def _pack(P, L):
    return jnp.concatenate(list(P), axis=0)  # (4L, BN)


def _unpack(a, L):
    return (a[0:L], a[L : 2 * L], a[2 * L : 3 * L], a[3 * L : 4 * L])


@functools.lru_cache(maxsize=None)
def _ladder_call(curve, nbits: int, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = curve.fp.spec
    L = spec.num_limbs
    C4 = 4 * L
    nwin = -(-nbits // WINDOW)
    nent = 1 << WINDOW

    def kernel(p_ref, np_ref, one_ref, k2d_ref, pts_ref, dig_ref, o_ref,
               tbl_ref):
        from jax.experimental import pallas as pl

        f = LimbMajorField(spec, p_ref[...], np_ref[...])
        one = one_ref[...]
        k2d = k2d_ref[...]
        zero = jnp.zeros_like(one)
        ident = (zero, one, one, zero)
        P = _unpack(pts_ref[...], L)

        # table[k] = k·P at rows [k*4L, (k+1)*4L). Built with a fori_loop —
        # one add graph in the compiled kernel instead of 14 (Mosaic compile
        # time scales with graph size; unrolled this kernel took ~8 min).
        tbl_ref[0:C4, :] = _pack(ident, L)
        tbl_ref[C4 : 2 * C4, :] = _pack(P, L)

        def tstep(k, prev):
            nxt = _pack(_ewadd(f, _unpack(prev, L), P, k2d), L)
            tbl_ref[pl.ds(k * C4, C4), :] = nxt
            return nxt

        lax.fori_loop(2, nent, tstep, _pack(P, L))

        def lookup(dig):
            # select tree over the 16 table entries: static ref slices +
            # lane-broadcast where at each level
            half = nent // 2
            lo = tbl_ref[0 : half * C4, :]
            hi = tbl_ref[half * C4 : nent * C4, :]
            sel = jnp.where(((dig >> (WINDOW - 1)) & 1) != 0, hi, lo)
            for level in range(WINDOW - 2, -1, -1):
                half //= 2
                bit = (dig >> level) & 1
                sel = jnp.where(bit != 0, sel[half * C4 :, :],
                                sel[: half * C4, :])
            return _unpack(sel, L)

        def body(w, acc_packed):
            # WINDOW doublings as an inner fori_loop: one dbl graph
            acc_packed = lax.fori_loop(
                0, WINDOW,
                lambda _, a: _pack(_ewdbl(f, _unpack(a, L)), L),
                acc_packed,
            )
            dig = dig_ref[pl.ds(nwin - 1 - w, 1), :]  # MSB-first
            acc = _ewadd(f, _unpack(acc_packed, L), lookup(dig), k2d)
            return _pack(acc, L)

        o_ref[...] = lax.fori_loop(0, nwin, body, _pack(ident, L))

    @jax.jit
    def run(pts_t, digits_t):  # (4L, N), (nwin, N); N multiple of BLOCK
        N = pts_t.shape[1]
        fp = curve.fp

        def bc(arr_np):
            return jnp.broadcast_to(
                jnp.asarray(np.asarray(arr_np))[:, None], (L, BLOCK)
            )

        consts = [bc(spec.p_limbs), bc(spec.nprime_limbs), bc(fp.one_np),
                  bc(curve.k2d_np)]
        cspec = pl.BlockSpec((L, BLOCK), lambda i: (0, 0))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((C4, N), pts_t.dtype),
            grid=(N // BLOCK,),
            in_specs=[cspec, cspec, cspec, cspec,
                      pl.BlockSpec((C4, BLOCK), lambda i: (0, i)),
                      pl.BlockSpec((nwin, BLOCK), lambda i: (0, i))],
            out_specs=pl.BlockSpec((C4, BLOCK), lambda i: (0, i)),
            scratch_shapes=[pltpu.VMEM((nent * C4, BLOCK), pts_t.dtype)],
            interpret=interpret,
        )(*consts, pts_t, digits_t)

    return run


def ladder_scalar_mul(curve, scalars, points, nbits: int,
                      interpret: bool = False):
    """Batched windowed scalar-mul via the whole-ladder kernel.

    scalars: plain-form (..., Ls); points: (..., 4, L). Leading axes are
    flattened, lanes padded to a BLOCK multiple (zero scalar · identity)."""
    fn, fp = curve.fn, curve.fp
    L = fp.L
    lead = points.shape[:-2]
    pts = jnp.broadcast_to(points, (*lead, 4, L)).reshape(-1, 4, L)
    scal = jnp.broadcast_to(
        jnp.asarray(scalars), (*lead, fn.L)
    ).reshape(-1, fn.L)
    N = pts.shape[0]
    # canonical lane counts (powers of two, floor BLOCK): one compiled
    # ladder program per count, shared across every MSM of similar size
    Np = BLOCK
    while Np < N:
        Np *= 2
    if Np != N:
        pts = jnp.concatenate(
            [pts, jnp.broadcast_to(jnp.asarray(curve.identity_np),
                                   (Np - N, 4, L))], axis=0
        )
        scal = jnp.concatenate(
            [scal, jnp.zeros((Np - N, fn.L), scal.dtype)], axis=0
        )
    nwin = -(-nbits // WINDOW)
    digits = fn.scalar_digits(scal, nwin * WINDOW, WINDOW)  # (Np, nwin)
    pts_t = pts.transpose(1, 2, 0).reshape(4 * L, Np)
    out_t = _ladder_call(curve, nbits, interpret)(pts_t, digits.T)
    out = out_t.reshape(4, L, Np).transpose(2, 0, 1)  # (Np, 4, L)
    return out[:N].reshape(*lead, 4, L)
