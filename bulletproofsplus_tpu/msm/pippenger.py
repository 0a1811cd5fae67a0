"""Device-side Pippenger bucket MSM.

Replaces the per-lane windowed ladder (msm/engine.py) for LARGE variable-base
MSMs. The ladder pays ~order_bits doublings + nwin adds per lane; Pippenger
shares all doublings across the whole MSM: each (point, window) pair costs
ONE bucket add, plus a per-window bucket reduction and one Horner combine.
Point-op count per N-lane MSM at window width c (B = 2^c buckets,
nwin = ceil(nbits/c) windows):

    ladder:     N · (nbits dbl + nwin add + 2^c table)   ≈ 335·N  (c=4, 253b)
    pippenger:  N·nwin + merge log2(K)·nwin·B + 2·nwin·B + nbits dbl
                ≈ 43·N + O(B·nwin)                        (c=6, 253b)

— ~6-8x fewer point ops once N ≫ B. This is the TPU answer to the
reference's naive MulVec (src/bls12_381/building_block/mulvec.rs:20-33;
SURVEY.md §7 step 3 names the sharded Pippenger MSM the #1 performance
component).

TPU-shaped formulation: the classic scatter-add is data-dependent, so the
pair axis is split into K SLICES, each owning a private (nwin, B) bucket
grid. A lax.scan walks the slices' points in lockstep — one point per slice
per step — and each step performs a batched gather (every (slice, window)
lane pulls its digit's bucket), ONE vectorized point add over all K·nwin
lanes, and a batched scatter back. Within a step all (slice, window) targets
are distinct by construction, so the scatter is conflict-free and XLA can
update the carried bucket tensor in place. Afterwards the K grids merge with
a log-depth tree, buckets reduce via a reverse associative scan
(Σ d·bucket_d = Σ suffix-sums), and windows combine with a Horner ladder of
c doublings per window.

Digits use window width c=6 by default: it divides both limb layouts (12-bit
TPU lanes, 24-bit CPU lanes), so no digit straddles a limb boundary.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

def _window() -> int:
    """Bucket window width c (must divide the limb width: 12-bit TPU lanes,
    24-bit CPU lanes → c ∈ {2, 3, 4, 6, 12}). Larger c = fewer bucket adds
    per lane (nbits/c) but 2^c× more bucket state and reduction work."""
    return int(os.environ.get("BPP_PIPPENGER_C", "6"))


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _pick_grid(N: int, R: int, nwin: int):
    """(K slices, steps) with K·steps >= N. Each scan step runs one
    R·K·nwin-lane point add, so K targets ~4096 busy lanes per step (full
    VPU tiles with headroom) while bounding bucket-grid memory
    (R·K·nwin·B points) and merge depth; multi-row calls (R large) already
    carry their parallelism in R·nwin and need few or no slices. steps
    rounds to 16 to keep the compiled-program count small."""
    env = os.environ.get("BPP_PIPPENGER_K")
    if env:
        # the slice-grid merge halves K per level — round a non-power-of-two
        # override UP to the next power of two rather than silently
        # mis-broadcasting in the merge loop
        K = _next_pow2(max(1, int(env)))
    else:
        K = min(64, max(1, _next_pow2(4096 // max(1, R * nwin))))
        if N < 256:
            K = min(K, 8)
    steps = -(-N // K)
    steps = -(-steps // 16) * 16
    return K, steps


@functools.lru_cache(maxsize=None)
def _pippenger_jit(curve, nbits: int, R: int, K: int, steps: int, c: int):
    fn = curve.fn
    B = 1 << c
    nwin = -(-nbits // c)

    ri = np.arange(R)[:, None, None]
    ki = np.arange(K)[None, :, None]
    wi = np.arange(nwin)[None, None, :]

    def f(digits, points):
        # digits: (R, K, steps, nwin) int32; points: (R, K, steps, C, L)
        ident = jnp.asarray(curve.identity_np).astype(points.dtype)
        buckets = jnp.broadcast_to(
            ident, (R, K, nwin, B, *ident.shape)
        )

        def step(bk, xs):
            dig, P = xs  # (R, K, nwin), (R, K, C, L)
            cur = bk[ri, ki, wi, dig]               # (R, K, nwin, C, L)
            # explicit broadcast: the staged curve ops stack coordinate
            # slices and need identical operand shapes
            new = curve.add(cur, jnp.broadcast_to(P[:, :, None], cur.shape))
            # distinct (r, k, w) per lane → conflict-free scatter; bucket 0
            # collects the dig==0 (and padding) lanes and is dropped below.
            # unique_indices + promise_in_bounds let XLA lower the scatter
            # without the serializing dedup/clamp paths.
            return bk.at[ri, ki, wi, dig].set(
                new, unique_indices=True, mode="promise_in_bounds"), None

        xs = (jnp.moveaxis(digits, 2, 0), jnp.moveaxis(points, 2, 0))
        buckets, _ = lax.scan(step, buckets, xs)

        # merge the K slice grids: log2(K) vectorized adds
        k = K
        while k > 1:
            buckets = curve.add(buckets[:, : k // 2], buckets[:, k // 2 :])
            k //= 2
        buckets = buckets[:, 0]                      # (R, nwin, B, C, L)

        # bucket reduction: S_w = Σ_{d>=1} d·bucket_d = Σ_d suffix_d where
        # suffix_d = Σ_{d'>=d} bucket_d'. Log-depth DOUBLING suffix sums
        # (uniform full-width shifted adds) instead of lax.associative_scan:
        # the same O(log B) depth but ~12 point-add graph nodes total — the
        # associative-scan form emitted a graph large enough to kill the
        # TPU compiler at B=64.
        suf = buckets[:, :, 1:]                      # drop bucket 0
        Bm1 = suf.shape[2]
        sh = 1
        while sh < Bm1:
            pad = jnp.broadcast_to(ident, (R, nwin, sh, *ident.shape))
            shifted = jnp.concatenate([suf[:, :, sh:], pad], axis=2)
            suf = curve.add(suf, shifted)
            sh *= 2
        # Σ_d suffix_d: balanced tree over the bucket axis
        b = Bm1
        while b > 1:
            half = b // 2
            paired = curve.add(suf[:, :, :half], suf[:, :, half : 2 * half])
            suf = (jnp.concatenate([paired, suf[:, :, 2 * half :]], axis=2)
                   if b % 2 else paired)
            b = suf.shape[2]
        S = suf[:, :, 0]                             # (R, nwin, C, L)

        # Horner combine MSB→LSB: acc = 2^c·acc + S_w
        def dbl_step(a, _):
            return curve.dbl(a), None

        def horner(acc, Sw):
            acc, _ = lax.scan(dbl_step, acc, None, length=c)
            return curve.add(acc, Sw), None

        acc0 = jnp.broadcast_to(ident, (R, *ident.shape))
        acc, _ = lax.scan(horner, acc0, jnp.moveaxis(S[:, ::-1], 1, 0))
        return acc                                    # (R, C, L)

    return jax.jit(f)


def msm_pippenger(curve, scalars, points, nbits: int | None = None):
    """Σᵢ scalars[i]·points[i] over axis -3 of points (same contract as
    engine.msm: plain-form scalars, leading axes are independent MSMs)."""
    fn = curve.fn
    nbits = nbits or fn.order_bits
    c = _window()
    assert fn.W % c == 0, "window must divide the limb width"
    nwin = -(-nbits // c)

    scalars = jnp.asarray(scalars)
    points = jnp.asarray(points)
    lead = points.shape[:-3]
    N = points.shape[-3]
    scalars = jnp.broadcast_to(scalars, (*lead, N, scalars.shape[-1]))

    R = 1
    for d in lead:
        R *= d
    K, steps = _pick_grid(N, R, nwin)
    Np = K * steps
    from ..utils.metrics import METRICS

    METRICS.msm_ops(R * Np, nbits, "pippenger")

    scalars = scalars.reshape(R, N, -1)
    points = points.reshape(R, N, *points.shape[-2:])
    if Np != N:
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((R, Np - N, scalars.shape[-1]),
                                scalars.dtype)], axis=1)
        ident = jnp.asarray(curve.identity_np).astype(points.dtype)
        points = jnp.concatenate(
            [points, jnp.broadcast_to(ident, (R, Np - N, *ident.shape))],
            axis=1)

    digits = fn.scalar_digits(scalars, nwin * c, c)   # (R, Np, nwin)
    digits = digits.reshape(R, K, steps, nwin)
    points = points.reshape(R, K, steps, *points.shape[-2:])
    out = _pippenger_jit(curve, nbits, R, K, steps, c)(digits, points)
    return out.reshape(*lead, *out.shape[-2:]) if lead else out[0]


def pippenger_enabled() -> bool:
    """Routing default: opt-in via BPP_PIPPENGER=1. Measured on TPU v5e
    (ed25519, 253-bit scalars): 66-75 ms vs the whole-ladder Pallas
    kernel's 56 ms at N=4096, 257 vs 255 ms at N=32768 — the scatter-scan
    body is bound by a ~0.1 ms/iteration launch overhead (constant in both
    slice count and bucket-state size), so the 6-8x point-op reduction
    does not yet surface as wall-clock. The engine stays differentially
    tested as the fallback for shapes where the ladder's per-lane
    doublings dominate (very wide single MSMs on future backends)."""
    env = os.environ.get("BPP_PIPPENGER")
    if env is not None:
        return env != "0"
    return False


def pippenger_min_lanes() -> int:
    """Lane threshold above which msm() routes to the bucket engine: below
    it the O(B·nwin) merge/reduction overhead exceeds the ladder savings."""
    return int(os.environ.get("BPP_PIPPENGER_MIN", "4096"))
