"""Multi-scalar multiplication engines.

Replaces the reference's MulVec (src/bls12_381/building_block/mulvec.rs:20-33
and its duplicate at src/secp256k1/building_block/secp256k1/util.rs:22-36),
which computes k full scalar-muls plus k adds one element at a time. Here the
whole MSM is an array program: every point runs a 4-bit windowed ladder in
lockstep across the batch (one fused VPU pass per window), and the final
accumulation is a balanced tree of vectorized point adds.

Windowed ladder (vs naive double-and-add): each point first builds its table
[0P..15P] (14 vectorized adds), then scans ceil(nbits/4) windows MSB-first,
each window = 4 doublings + one table select + one add. Total vector point
ops per 253-bit scalar: ~14 + 64*6 ≈ 400 vs 506 for double-and-add — and 4x
fewer scan iterations, which is what dominates XLA compile time.

Shape discipline: batch sizes are padded to the next power of two with a
floor of MSM_FLOOR (identity points / zero scalars), so every distinct MSM
width in a whole proof run collapses onto a handful of canonical programs
(compile-once per session, persistently cached across sessions). Runtime of
the padded lanes is pure throughput waste on sub-floor sizes, but every MSM
here is either >= the floor or executes in < 1 ms.

`msm` / `scalar_mul` take PLAIN-form (non-Montgomery) scalar limb arrays over
the curve's scalar field and (..., C, L) point limb tensors.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax

WINDOW = 4  # window width in bits; divides the 12-bit limb width
# Canonical MSM widths: every MSM is padded to SMALL (width <= SMALL) or
# chunked into rows of CHUNK (width > SMALL), so the entire protocol — every
# proof size, every WIP round, batch verification — executes on a handful of
# compiled programs keyed by (rows, width). On TPU, XLA compile time (~40 s
# per program) dominates everything else while padded lanes cost
# sub-millisecond runtime, so widths are large. On CPU (tests / virtual-mesh
# runs) the opposite holds — runtime scales with padded width while small
# compiles are cheap — so widths stay at the natural power of two.


def _canon_params():
    import jax

    if jax.default_backend() == "cpu":
        return (int(os.environ.get("BPP_MSM_SMALL", "32")),
                int(os.environ.get("BPP_MSM_CHUNK", "256")))
    return (int(os.environ.get("BPP_MSM_SMALL", "256")),
            int(os.environ.get("BPP_MSM_CHUNK", "2048")))


def small_floor() -> int:
    """Padding floor for auxiliary per-round programs (generator folds)."""
    return _canon_params()[0]


def _ladder_ok(curve) -> bool:
    """Whole-ladder Pallas MSM: all three backends on TPU (the kernel covers
    extended-edwards and projective-weierstrass points; 12-bit limbs keep
    partial products in int32), unless disabled via BPP_PALLAS=0."""
    import jax

    return (getattr(curve, "COORDS", 0) in (3, 4)
            and curve.fp.W <= 15
            and jax.default_backend() == "tpu"
            and os.environ.get("BPP_PALLAS") != "0")


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def is_batch_tracer(x) -> bool:
    """Whether x is a vmap batching tracer (the Pallas grouped/revisiting
    kernels do not compile under vmap batching — such callers must take the
    XLA paths). If the tracer class cannot be located in this jax version,
    conservatively answer True (degrading kernel users to XLA)."""
    try:
        from jax._src.interpreters.batching import BatchTracer
    except ImportError:  # moved across jax versions
        try:
            from jax.interpreters.batching import BatchTracer
        except Exception:
            return True
    return isinstance(x, BatchTracer)


def _pad_axis(arr, axis: int, n2: int, pad_block):
    """Pad `arr` along `axis` to length n2 with broadcast copies of
    pad_block (shape = arr.shape with that axis removed... broadcastable)."""
    n = arr.shape[axis]
    if n2 == n:
        return arr
    shape = list(arr.shape)
    shape[axis] = n2 - n
    pad = jnp.broadcast_to(pad_block, shape)
    return jnp.concatenate([arr, pad], axis=axis)


def _table_lookup(curve, table, dig):
    """table: (..., 2^c, C, L); dig: (...,) int32 in [0, 2^c) →
    (..., C, L) via a select tree (branchless, no gather)."""
    c = table.shape[-3].bit_length() - 1
    for level in range(c - 1, -1, -1):
        half = 1 << level
        bit = ((dig >> level) & 1).astype(bool)
        table = curve.select(bit[..., None], table[..., half:, :, :],
                             table[..., :half, :, :])
    return table[..., 0, :, :]


@functools.lru_cache(maxsize=None)
def _scalar_mul_jit(curve, nbits: int):
    c = WINDOW
    nwin = -(-nbits // c)

    def f(scalars, points):
        fn = curve.fn
        ident = curve.identity_like(points.shape[:-2])

        # table[k] = k·P: one scanned add body instead of 14 unrolled adds
        # (compile time scales with graph size, not trip count)
        def tstep(acc, _):
            return curve.add(acc, points), acc

        _, table = lax.scan(tstep, ident, None, length=1 << c)
        table = jnp.moveaxis(table, 0, -3)  # (..., 16, C, L)

        digits = fn.scalar_digits(scalars, nwin * c, c)  # (..., nwin) LSB-first
        digits_scan = jnp.moveaxis(digits, -1, 0)[::-1]  # MSB-first

        def dbl_step(acc, _):
            return curve.dbl(acc), None

        def body(acc, dig):
            # c doublings as a sub-scan: one dbl graph in the compiled body
            # instead of c copies (compile time scales with graph size)
            acc, _ = lax.scan(dbl_step, acc, None, length=c)
            return curve.add(acc, _table_lookup(curve, table, dig)), None

        acc, _ = lax.scan(body, ident, digits_scan)
        return acc

    return jax.jit(f)


def scalar_mul(curve, scalars, points, nbits: int | None = None):
    """Batched windowed ladder: out[i] = scalars[i] · points[i].

    scalars: plain-form (..., Ls) limbs (or (Ls,) broadcast over points);
    points: (..., C, L). nbits caps the scalar bit-width (default: the
    scalar-field order width)."""
    nbits = nbits or curve.fn.order_bits
    return _scalar_mul_jit(curve, nbits)(scalars, points)


@functools.lru_cache(maxsize=None)
def _tree_sum_jit(curve, axis_from_end: int = 3):
    def f(points):  # reduce over axis -3: (..., 2^k, C, L) → (..., C, L)
        n = points.shape[-3]
        while n > 1:
            points = curve.add(points[..., : n // 2, :, :],
                               points[..., n // 2 :, :, :])
            n //= 2
        return points[..., 0, :, :]

    return jax.jit(f)


def tree_sum(curve, points):
    """Σ points over axis -3 via a balanced tree of vectorized adds.

    Wide reductions on TPU route through the grouped accumulate kernel
    (pallas_curve.sum_points_grouped): one HBM pass + a BLOCK-lane tail
    tree, instead of log2(n) XLA levels each re-materialized through HBM."""
    n = points.shape[-3]
    if n == 0:
        return jnp.broadcast_to(jnp.asarray(curve.identity_np),
                                (*points.shape[:-3], *points.shape[-2:]))
    # the grouped kernel handles leading axes natively but its revisiting
    # out-window pattern does not compile under vmap batching — batched
    # tracers take the XLA tree (callers wanting the kernel pass stacked
    # leading axes instead of vmapping, e.g. batchprove's bit commitment).
    # Threshold on TOTAL lanes (leading axes are kernel groups).
    total = n
    for d in points.shape[:-3]:
        total *= d
    # threshold lowered 2048 → 512 in round 5: the kernel reduction is both
    # faster at the 512-lane fixed-kernel tail AND immune to the in-context
    # XLA tree miscompile root-caused in the K-batched prover (see
    # wip._joint_rows_msm) — keep XLA only for genuinely tiny sums.
    if (_ladder_ok(curve) and n > 1
            and total >= int(os.environ.get("BPP_SUM_KERNEL_MIN", "512"))
            and os.environ.get("BPP_SUM_KERNEL", "1") == "1"
            and not is_batch_tracer(points)):
        from ..curves.pallas_curve import sum_points_grouped

        return sum_points_grouped(curve, points)
    n2 = _next_pow2(n)
    points = _pad_axis(points, points.ndim - 3,
                       n2, jnp.asarray(curve.identity_np))
    return _tree_sum_jit(curve)(points)


@functools.lru_cache(maxsize=None)
def _msm_jit(curve, nbits: int):
    sm = _scalar_mul_jit(curve, nbits)
    ts = _tree_sum_jit(curve)

    def f(scalars, points):
        return ts(sm(scalars, points))

    return jax.jit(f)


def msm(curve, scalars, points, nbits: int | None = None):
    """Σᵢ scalars[i]·points[i] over axis -3 of points (MulVec::calculate
    semantics, vectorized; leading axes are independent batched MSMs).

    Canonicalization: all leading batch axes and the pair axis are reshaped
    to (rows, width) with width ∈ {MSM_SMALL, MSM_CHUNK} and rows a power of
    two, so every call in the protocol lands on one of a handful of compiled
    programs. Chunked rows of one logical MSM are tree-added afterwards."""
    nbits = nbits or curve.fn.order_bits
    scalars = jnp.asarray(scalars)
    points = jnp.asarray(points)
    lead = points.shape[:-3]
    W = points.shape[-3]
    scalars = jnp.broadcast_to(scalars, (*lead, W, scalars.shape[-1]))

    lanes = W
    for d in lead:
        lanes *= d
    from ..utils.metrics import METRICS

    METRICS.msm_ops(lanes, nbits, "ladder")
    if _ladder_ok(curve) and lanes >= 1024:
        # J-way joint whole-ladder Pallas kernel: groups of J consecutive
        # (scalar, point) pairs share the ~nbits doublings that dominate
        # the 1-way ladder (measured at N=4096 ed25519: 1-way 54 ms,
        # J=2 43 ms, J=4 40 ms wall incl. ~29 ms dispatch floor — device
        # time ~2.3x at J=4), then a grouped-sum kernel reduces the
        # J-fold-shorter product axis.
        from ..curves.pallas_curve import joint_ladder_msm_grouped

        env_j = os.environ.get("BPP_MSM_J")
        # measured on v5e at the batch-verify shape (N≈5000): J=2 51.7 ms,
        # J=4 48.7 ms, J=8 41.5 ms wall incl. ~29 ms dispatch floor
        J = int(env_j) if env_j else (
            8 if lanes >= 4096 else 4 if lanes >= 2048 else 2)
        W2 = -(-W // J) * J
        if W2 != W:
            scalars = _pad_axis(scalars, scalars.ndim - 2, W2,
                                jnp.zeros(scalars.shape[-1], scalars.dtype))
            points = _pad_axis(points, points.ndim - 3, W2,
                               jnp.asarray(curve.identity_np))
        prods = joint_ladder_msm_grouped(curve, scalars, points, nbits, J)
        return tree_sum(curve, prods)

    small, chunk = _canon_params()
    # canonical width: power of two clamped to [small, chunk]; wider MSMs
    # split into chunk-width rows
    width = min(max(_next_pow2(max(1, W)), small), chunk)
    k = -(-W // width)  # chunks per logical MSM
    Wp = k * width
    scalars = _pad_axis(scalars, scalars.ndim - 2, Wp,
                        jnp.zeros(scalars.shape[-1], jnp.int32))
    points = _pad_axis(points, points.ndim - 3, Wp,
                       jnp.asarray(curve.identity_np))

    B = 1
    for d in lead:
        B *= d
    M = _next_pow2(B * k)
    scalars = scalars.reshape(B * k, width, scalars.shape[-1])
    points = points.reshape(B * k, width, *points.shape[-2:])
    scalars = _pad_axis(scalars, 0, M, jnp.zeros(scalars.shape[-1], jnp.int32))
    points = _pad_axis(points, 0, M, jnp.asarray(curve.identity_np))

    out = _msm_jit(curve, nbits)(scalars, points)  # (M, C, L)
    out = out[: B * k].reshape(B, k, *out.shape[-2:])
    if k > 1:
        out = tree_sum(curve, out)  # reduce chunk axis
    else:
        out = out[:, 0]
    return out.reshape(*lead, *out.shape[-2:]) if lead else out[0]
