"""Weighted-inner-product argument as array programs.

Mirrors the reference's WeightedInnerProductProof
(src/weighted_inner_product_proof.rs): `prove` is the log-halving fold loop
(:36-227), `verification_scalars` the challenge replay + s_vec expansion
(:330-382), and the verify equation is folded into the range proof's single
MSM by the caller (:238-328). Differences by design:

- every per-element loop is a whole-array op (folds, inner products);
- the s_vec recurrence (:372-380) is reformulated as a product over challenge
  bits — log(n) vectorized selects instead of a sequential recurrence;
- batch inversion is the Montgomery trick, not per-element inversion.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import VerificationError
from ..msm import msm, scalar_mul


@dataclasses.dataclass
class WipProof:
    """Proof of 2·log2(n) points + A, B and three scalars
    (reference struct wip:24-33). Scalars are Montgomery-form limb vectors."""

    L_vec: jnp.ndarray  # (rounds, C, L)
    R_vec: jnp.ndarray  # (rounds, C, L)
    A: jnp.ndarray      # (C, L)
    B: jnp.ndarray      # (C, L)
    r_prime: jnp.ndarray  # (L,)
    s_prime: jnp.ndarray  # (L,)
    d_prime: jnp.ndarray  # (L,)

    @property
    def rounds(self) -> int:
        return self.L_vec.shape[0]


def _wip(fn, a, b, y):
    """Weighted inner product Σ aᵢ·bᵢ·yᵢ (reference util.rs:117-127)."""
    return fn.sum(fn.mul(fn.mul(a, b), y))


def _pad_points(curve, points, width: int):
    """Pad the -3 (pair) axis with identity points up to `width`."""
    n = points.shape[-3]
    if n >= width:
        return points
    pad = jnp.broadcast_to(
        jnp.asarray(curve.identity_np),
        (*points.shape[:-3], width - n, *points.shape[-2:]),
    )
    return jnp.concatenate([points, pad], axis=-3)


def _round_lr_core(curve, a, b, power_of_y, G, H, g, h, d_L_m, d_R_m):
    """One round's L, R commitments (wip:90-125). Array inputs are the
    CURRENT (pre-halving) length-2n state; returns (L, R, y_nhat,
    y_nhat_inv) so the fold step does not redo the Fermat inversion."""
    fn = curve.fn
    n = a.shape[0] // 2
    a1, a2 = a[:n], a[n:]
    b1, b2 = b[:n], b[n:]
    y1, y2 = power_of_y[:n], power_of_y[n:]
    G1, G2 = G[:n], G[n:]
    H1, H2 = H[:n], H[n:]

    c_L = _wip(fn, a1, b2, y1)
    c_R = _wip(fn, a2, b1, y2)
    y_nhat = y1[n - 1]
    y_nhat_inv = fn.inv(y_nhat)

    # L = Σ (ŷ⁻¹a1)ᵢ·G2ᵢ + Σ b2ᵢ·H1ᵢ + c_L·g + d_L·h   (wip:98-113)
    # R = Σ (ŷ·a2)ᵢ·G1ᵢ + Σ b1ᵢ·H2ᵢ + c_R·g + d_R·h   (wip:115-125)
    LR_scalars = jnp.stack([
        jnp.concatenate(
            [fn.mul(a1, y_nhat_inv), b2, c_L[None], d_L_m[None]], axis=0
        ),
        jnp.concatenate(
            [fn.mul(a2, y_nhat), b1, c_R[None], d_R_m[None]], axis=0
        ),
    ])
    LR_points = jnp.stack([
        jnp.concatenate([G2, H1, g[None], h[None]], axis=0),
        jnp.concatenate([G1, H2, g[None], h[None]], axis=0),
    ])
    from ..msm.engine import _ladder_ok

    if _ladder_ok(curve):
        # joint Pallas regardless of the per-proof width: under vmap the
        # true lane count is K× larger, and the XLA ladder fallback costs
        # ~60-240 ms per small round at K=16 (see _joint_rows_msm)
        LR = _joint_rows_msm(curve, fn.from_mont(LR_scalars), LR_points,
                             fn.order_bits)
    else:
        LR = msm(curve, fn.from_mont(LR_scalars), LR_points)
    return LR[0], LR[1], y_nhat, y_nhat_inv


def _round_fold_core(curve, fold_pad, a, b, power_of_y, G, H, alpha,
                     d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv):
    """One round's state fold (wip:147-171) given the challenge e.

    The reference's running P += e²L + e⁻²R (wip:137-142) is dropped: P is
    never read again by the prover (the proof output is L/R/A/B/r'/s'/δ'
    only), so it is dead work."""
    fn = curve.fn
    n = a.shape[0] // 2
    a1, a2 = a[:n], a[n:]
    b1, b2 = b[:n], b[n:]
    G1, G2 = G[:n], G[n:]
    H1, H2 = H[:n], H[n:]

    e_inv = fn.inv(e_m)
    e_sqr = fn.mul(e_m, e_m)
    e_sqr_inv = fn.mul(e_inv, e_inv)

    a_next = fn.add(fn.mul(a1, e_m), fn.mul(a2, fn.mul(y_nhat, e_inv)))
    b_next = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
    fold4 = fn.from_mont(
        jnp.stack([e_inv, fn.mul(y_nhat_inv, e_m), e_m, e_inv])
    )
    from ..msm.engine import _ladder_ok

    if _ladder_ok(curve):
        # J=2 joint ladder: each (G1[i], G2[i]) / (H1[i], H2[i]) pair IS
        # one fold output — shared doublings, no post-ladder adds (the
        # interactive sha-mode fold takes this path too)
        from ..curves.pallas_curve import joint_ladder_msm_grouped

        pair_p = jnp.concatenate([
            jnp.stack([G1, G2], axis=1),
            jnp.stack([H1, H2], axis=1),
        ]).reshape(4 * n, *G1.shape[-2:])
        pair_s = jnp.concatenate([
            jnp.broadcast_to(fold4[:2][None], (n, 2, fn.L)),
            jnp.broadcast_to(fold4[2:][None], (n, 2, fn.L)),
        ]).reshape(4 * n, fn.L)
        out = joint_ladder_msm_grouped(
            curve, pair_s, pair_p, fn.order_bits, 2)
        G_next, H_next = out[:n], out[n:]
    else:
        fold_scalars = fold4[:, None, :]
        fold_points = jnp.stack([G1, G2, H1, H2])  # (4, n, C, L)
        fold_points = _pad_points(curve, fold_points, fold_pad)
        fg = scalar_mul(curve, fold_scalars, fold_points)
        G_next = curve.add(fg[0], fg[1])[:n]
        H_next = curve.add(fg[2], fg[3])[:n]
    alpha_next = fn.add(
        alpha, fn.add(fn.mul(e_sqr, d_L_m), fn.mul(e_sqr_inv, d_R_m))
    )
    return a_next, b_next, power_of_y[:n], G_next, H_next, alpha_next


def _round_fold_lr_core(curve, fold_pad, a, b, power_of_y, G, H, g, h,
                        alpha, d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv,
                        d_L2_m, d_R2_m):
    """Fold round r (challenge e known) AND emit round r+1's L/R in ONE
    program. The interactive Fiat-Shamir prover must round-trip to the host
    between L/R and the challenge; fusing the *following* fold with the
    *next* L/R halves its device dispatches: 2·log2(mn) → log2(mn)+1
    (wip:147-171 then :90-125)."""
    a, b, power_of_y, G, H, alpha = _round_fold_core(
        curve, fold_pad, a, b, power_of_y, G, H, alpha,
        d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv)
    L, R, y_nhat2, y_nhat_inv2 = _round_lr_core(
        curve, a, b, power_of_y, G, H, g, h, d_L2_m, d_R2_m)
    return L, R, a, b, power_of_y, G, H, alpha, y_nhat2, y_nhat_inv2


def _round_fold_final_core(curve, fold_pad, a, b, power_of_y, G, H, g, h,
                           alpha, d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv,
                           r_m, s_m, delta_m, eta_m):
    """Last fold + the final A/B commitments in ONE program (wip:147-171
    then :181-208). Returns (A, B, a, b, alpha) — a, b, alpha feed the
    final-response scalars after the host hashes (A, B) into e."""
    a, b, power_of_y, G, H, alpha = _round_fold_core(
        curve, fold_pad, a, b, power_of_y, G, H, alpha,
        d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv)
    A, B = _final_ab_core(curve, a, b, power_of_y[0], G[0], H[0], g, h,
                          r_m, s_m, delta_m, eta_m)
    return A, B, a, b, alpha


def _fuse_rounds_ok() -> bool:
    """Fuse each interactive round's fold with the next round's L/R
    (default on — same math, strictly fewer dispatches; BPP_FUSE_ROUNDS=0
    restores the separate per-round programs for differential debugging)."""
    import os

    return os.environ.get("BPP_FUSE_ROUNDS", "1") == "1"


def _final_ab_core(curve, a, b, y0, G0, H0, g, h, r_m, s_m, delta_m, eta_m):
    """Final commitments A, B (wip:181-208) after the fold reaches n=1."""
    fn = curve.fn
    # A = r·G0 + s·H0 + (r·y·b0 + s·y·a0)·g + δ·h ; B = (r·y·s)·g + η·h
    rcbsca = fn.add(
        fn.mul(fn.mul(r_m, y0), b[0]), fn.mul(fn.mul(s_m, y0), a[0])
    )
    rcs = fn.mul(fn.mul(r_m, y0), s_m)
    AB_scalars = jnp.stack([
        jnp.stack([r_m, s_m, rcbsca, delta_m]),
        jnp.stack([rcs, eta_m, fn.zero_like(r_m), fn.zero_like(r_m)]),
    ])
    ident = curve.identity_like(())
    AB_points = jnp.stack([
        jnp.stack([G0, H0, g, h]),
        jnp.stack([g, h, ident, ident]),
    ])
    AB = msm(curve, fn.from_mont(AB_scalars), AB_points)
    return AB[0], AB[1]


def _final_scalars_core(curve, a, b, alpha, r_m, s_m, delta_m, eta_m, e_m):
    """Final response scalars r', s', δ' (wip:211-216)."""
    fn = curve.fn
    r_prime = fn.add(r_m, fn.mul(a[0], e_m))
    s_prime = fn.add(s_m, fn.mul(b[0], e_m))
    d_prime = fn.add(
        eta_m, fn.add(fn.mul(delta_m, e_m), fn.mul(alpha, fn.mul(e_m, e_m)))
    )
    return r_prime, s_prime, d_prime


def _joint_rows_msm(curve, scalars_plain, points, nbits: int):
    """Force the J-way joint Pallas path for a (rows, W) MSM regardless of
    the UNBATCHED lane count: inside vmapped prover programs msm()'s lane
    heuristic sees per-proof shapes, but the real batch is K× bigger — and
    the XLA scan-ladder fallback costs ~60-240 ms per round at K=16 even
    for 4-lane rounds (253 sequential taxed point ops; profiled via
    jax.profiler). Pads W to a multiple of 4 and tree-sums the J-groups."""
    from ..msm.engine import _ladder_ok, is_batch_tracer, tree_sum
    from ..curves.pallas_curve import joint_ladder_msm_grouped

    W = points.shape[-3]
    J = 4 if W % 4 == 0 or W >= 8 else 2
    Wp = -(-W // J) * J
    if Wp != W:
        pad_s = jnp.zeros((*scalars_plain.shape[:-2], Wp - W,
                           scalars_plain.shape[-1]), scalars_plain.dtype)
        scalars_plain = jnp.concatenate([scalars_plain, pad_s], axis=-2)
        ident = jnp.asarray(curve.identity_np)
        pad_p = jnp.broadcast_to(
            ident, (*points.shape[:-3], Wp - W, *points.shape[-2:]))
        points = jnp.concatenate([points, pad_p], axis=-3)
    prods = joint_ladder_msm_grouped(curve, scalars_plain, points, nbits, J)
    if _ladder_ok(curve) and not is_batch_tracer(prods):
        # ALWAYS reduce through the grouped-sum Pallas kernel here, not
        # tree_sum's size-gated choice: inside the K-batched whole-fold
        # program XLA MISCOMPILES the padded halving tree at the first
        # round whose group count drops under the kernel threshold
        # (n=1024, K=16: round 3 only — every proof's L/R wrong while the
        # joint-ladder products and the same tree out-of-program are
        # bit-correct; root-caused via scripts/validate_prover_kbatched +
        # in-program instrumentation, round-5). The kernel reduction is
        # correct in-context and was the production path for the wide
        # rounds already.
        from ..curves.pallas_curve import sum_points_grouped

        return sum_points_grouped(curve, prods)
    return tree_sum(curve, prods)


def _fold_pad(n: int) -> int:
    from ..msm.engine import small_floor

    return max(small_floor(), n // 2)  # one fold program per proof size


def _fuse_ok() -> bool:
    """Whether to fuse prover phases into per-proof-size compiled programs.

    On TPU (remote dispatch ~100-500 ms per op) fusion is a ~100x win; on
    XLA:CPU (tests, virtual meshes) each fused program is a fresh multi-
    second compile per proof size while eager per-op programs are shared
    across all sizes — so fusion is TPU-only unless forced for testing."""
    import os

    v = os.environ.get("BPP_FUSE_PROVER")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=None)
def _round_lr_jit(curve, n: int):
    return jax.jit(functools.partial(_round_lr_core, curve))


@functools.lru_cache(maxsize=None)
def _round_fold_jit(curve, n: int, fold_pad: int):
    return jax.jit(functools.partial(_round_fold_core, curve, fold_pad))


@functools.lru_cache(maxsize=None)
def _round_fold_lr_jit(curve, n: int, fold_pad: int):
    return jax.jit(functools.partial(_round_fold_lr_core, curve, fold_pad))


@functools.lru_cache(maxsize=None)
def _round_fold_final_jit(curve, n: int, fold_pad: int):
    return jax.jit(functools.partial(_round_fold_final_core, curve,
                                     fold_pad))


@functools.lru_cache(maxsize=None)
def _final_ab_jit(curve):
    return jax.jit(functools.partial(_final_ab_core, curve))


@functools.lru_cache(maxsize=None)
def _final_scalars_jit(curve):
    return jax.jit(functools.partial(_final_scalars_core, curve))


def _wip_prove_known_scan_prog(curve, n: int):
    """The WHOLE fold loop + final commitments/responses as ONE compiled
    program, for transcripts whose challenges are known before the prover's
    messages (deterministic/replay mode).

    TPU-native structure: instead of unrolling log2(n) rounds of shrinking
    shapes (a compile bomb — every round's MSM ladder re-inlines), the loop
    is a lax.scan over a CONSTANT-SHAPE round body. State arrays stay at
    their full length; the active prefix halves each round and is tracked
    with per-round masks and clamped gather indices (precomputed numpy
    constants fed through the scan). Inactive MSM lanes carry zero scalars,
    so their (garbage) points contribute the identity. All modular
    inversions (challenge e's, y-hat powers) happen OUTSIDE the scan via one
    batched Fermat inversion, so the round body is inversion-free.

    Cost vs the halving loop: each round runs full-width lanes, ~log2(n)/2 x
    more lane-work total — pure vector throughput, bought back many times
    over by 1 dispatch instead of ~30xlog2(n) and one small compiled body."""
    from ..msm.engine import _scalar_mul_jit, _tree_sum_jit, _next_pow2

    fn = curve.fn
    logn = n.bit_length() - 1
    half = n // 2
    nbits = fn.order_bits
    W = n + 2                     # a-part + b-part + c·g + d·h lanes
    WP = _next_pow2(W)            # tree_sum needs a power of two

    hs = [n >> (r + 1) for r in range(logn)]          # active half-length
    idx_hi_np = np.stack(
        [np.minimum(np.arange(half) + h, n - 1) for h in hs]
    ).astype(np.int32)                                 # (logn, half)
    mask_np = np.stack([np.arange(half) < h for h in hs])  # (logn, half)

    def f(a, b, power_of_y, alpha, G, H, g, h,
          es_m, dLs_m, dRs_m, r_m, s_m, delta_m, eta_m, ef_m):
        sm = _scalar_mul_jit(curve, nbits)
        ts = _tree_sum_jit(curve)
        ident = jnp.asarray(curve.identity_np)

        # per-round challenge derivatives, batch-inverted outside the scan
        _, es_inv = fn.batch_invert(es_m)
        es_sqr = fn.mul(es_m, es_m)
        es_inv_sqr = fn.mul(es_inv, es_inv)
        # ŷ_r = y^{h_r} = power_of_y[h_r - 1] (powers_type2 is y, y², ...)
        ynhats = power_of_y[np.array([h - 1 for h in hs])]    # (logn, L)
        _, ynhat_invs = fn.batch_invert(ynhats)

        y1 = power_of_y[:half]  # invariant: the active y-prefix never moves

        def body(carry, xs):
            a, b, G, H, alpha = carry
            (e_m, e_inv, e_sqr, e_sqr_inv, dL, dR, ynhat, ynhat_inv,
             ihi, msk) = xs
            zerov = jnp.zeros((half, fn.L), jnp.int32)

            a1, b1 = a[:half], b[:half]
            G1, H1 = G[:half], H[:half]
            a2, b2 = a[ihi], b[ihi]        # gathers: (half, L)
            G2, H2 = G[ihi], H[ihi]        # (half, C, L)

            # c_L = Σ a1·b2·y1 ; c_R = Σ a2·b1·y2, y2 = y1·ŷ  (wip:90-91)
            c_L = fn.sum(fn.select(msk, fn.mul(fn.mul(a1, b2), y1), zerov))
            c_R = fn.sum(fn.select(
                msk, fn.mul(fn.mul(a2, b1), fn.mul(y1, ynhat)), zerov))

            # L = Σ (ŷ⁻¹a1)·G2 + Σ b2·H1 + c_L·g + d_L·h   (wip:98-113)
            # R = Σ (ŷ a2)·G1 + Σ b1·H2 + c_R·g + d_R·h    (wip:115-125)
            sL = jnp.concatenate([
                fn.select(msk, fn.mul(a1, ynhat_inv), zerov),
                fn.select(msk, b2, zerov), c_L[None], dL[None],
            ])
            sR = jnp.concatenate([
                fn.select(msk, fn.mul(a2, ynhat), zerov),
                fn.select(msk, b1, zerov), c_R[None], dR[None],
            ])
            pL = jnp.concatenate([G2, H1, g[None], h[None]])
            pR = jnp.concatenate([G1, H2, g[None], h[None]])
            S = jnp.stack([sL, sR])                       # (2, W, L)
            P = jnp.stack([pL, pR])                       # (2, W, C, L)
            if WP != W:
                S = jnp.concatenate(
                    [S, jnp.zeros((2, WP - W, fn.L), jnp.int32)], axis=1)
                P = jnp.concatenate(
                    [P, jnp.broadcast_to(ident, (2, WP - W, *ident.shape))],
                    axis=1)
            LR = ts(sm(fn.from_mont(S), P))               # (2, C, L)

            # fold a, b, G, H (wip:147-164); results live in lanes [0, h_r)
            a_new = fn.add(fn.mul(a1, e_m), fn.mul(a2, fn.mul(ynhat, e_inv)))
            b_new = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
            a_new = fn.select(msk, a_new, zerov)
            b_new = fn.select(msk, b_new, zerov)
            fs = jnp.broadcast_to(
                fn.from_mont(jnp.stack(
                    [e_inv, fn.mul(ynhat_inv, e_m), e_m, e_inv]
                ))[:, None, :],
                (4, half, fn.L),
            )
            fp = jnp.stack([G1, G2, H1, H2])              # (4, half, C, L)
            fg = sm(fs, fp)
            G_new = curve.add(fg[0], fg[1])
            H_new = curve.add(fg[2], fg[3])
            alpha = fn.add(
                alpha, fn.add(fn.mul(e_sqr, dL), fn.mul(e_sqr_inv, dR)))

            pad_f = jnp.zeros((n - half, fn.L), jnp.int32)
            pad_p = jnp.broadcast_to(ident, (n - half, *ident.shape))
            carry = (
                jnp.concatenate([a_new, pad_f]),
                jnp.concatenate([b_new, pad_f]),
                jnp.concatenate([G_new, pad_p]),
                jnp.concatenate([H_new, pad_p]),
                alpha,
            )
            return carry, LR

        xs = (es_m, es_inv, es_sqr, es_inv_sqr, dLs_m, dRs_m,
              ynhats, ynhat_invs,
              jnp.asarray(idx_hi_np), jnp.asarray(mask_np))
        (a, b, G, H, alpha), LRs = jax.lax.scan(
            body, (a, b, G, H, alpha), xs)

        # final A, B (wip:181-208) — direct 4-lane ladder, no canonical pad
        y0 = power_of_y[0]
        rcbsca = fn.add(
            fn.mul(fn.mul(r_m, y0), b[0]), fn.mul(fn.mul(s_m, y0), a[0]))
        rcs = fn.mul(fn.mul(r_m, y0), s_m)
        zf = jnp.zeros((fn.L,), jnp.int32)
        AB_s = jnp.stack([
            jnp.stack([r_m, s_m, rcbsca, delta_m]),
            jnp.stack([rcs, eta_m, zf, zf]),
        ])
        AB_p = jnp.stack([
            jnp.stack([G[0], H[0], g, h]),
            jnp.stack([g, h, ident, ident]),
        ])
        AB = ts(sm(fn.from_mont(AB_s), AB_p))
        A, B = AB[0], AB[1]

        r_prime, s_prime, d_prime = _final_scalars_core(
            curve, a, b, alpha, r_m, s_m, delta_m, eta_m, ef_m)
        return LRs[:, 0], LRs[:, 1], A, B, r_prime, s_prime, d_prime

    return f


def _prover_pallas() -> bool:
    """Route the unrolled prover's >=1024-lane rounds through the
    whole-ladder Pallas kernel. Default ON (TPU only — _ladder_ok gates on
    backend): validated against the XLA scan ladder on hardware by
    scripts/validate_prover_pallas.py — scalars byte-exact, points
    affine-equal (identical serialized proofs; the two engines pad MSM
    lanes differently, so projective representatives may differ by a
    scalar factor). BPP_PROVER_PALLAS=0
    forces the XLA path. Read at CALL time and part of the compiled-program
    cache key, so flipping the env var mid-process takes effect."""
    import os

    return os.environ.get("BPP_PROVER_PALLAS", "1") == "1"


def _wip_prove_known_unrolled_prog(curve, n: int, pallas: bool = False):
    """The whole fold loop + finals as ONE compiled program with TRUE
    per-round shapes (the halving loop unrolled log2(n) times).

    The scan variant above keeps one constant-shape body — elegant, but
    every round then runs full-width lanes: at n=1024 that is ~7x more
    ladder point-ops than the true Σ(2·n̂+2 + 4·n̂) halving widths
    (measured 23.4 s → the fold dominates batch proving). Unrolling costs
    one larger compile (persistently cached) and does only the real work.
    Same inputs/outputs as the scan program; scalars byte-exact, points
    affine-equal (identical serialized proofs).

    Point products route through msm()/the whole-ladder Pallas kernel for
    rounds with >=1024 lanes (the same path the verifier and the batch
    setup program take — Pallas-under-vmap is already exercised by the
    setup MSM); small tail rounds use the XLA scan ladder."""
    from ..msm.engine import (
        _ladder_ok,
        _next_pow2,
        _scalar_mul_jit,
        _tree_sum_jit,
    )

    fn = curve.fn
    logn = n.bit_length() - 1
    nbits = fn.order_bits
    hs = [n >> (r + 1) for r in range(logn)]

    def f(a, b, power_of_y, alpha, G, H, g, h,
          es_m, dLs_m, dRs_m, r_m, s_m, delta_m, eta_m, ef_m):
        sm = _scalar_mul_jit(curve, nbits)
        ts = _tree_sum_jit(curve)
        ident = jnp.asarray(curve.identity_np)

        _, es_inv = fn.batch_invert(es_m)
        es_sqr = fn.mul(es_m, es_m)
        es_inv_sqr = fn.mul(es_inv, es_inv)
        ynhats = power_of_y[np.array([h_ - 1 for h_ in hs])]  # (logn, L)
        _, ynhat_invs = fn.batch_invert(ynhats)

        Ls, Rs = [], []
        for r in range(logn):
            half = hs[r]
            e_m, e_inv = es_m[r], es_inv[r]
            ynhat, ynhat_inv = ynhats[r], ynhat_invs[r]
            dL, dR = dLs_m[r], dRs_m[r]
            a1, a2 = a[:half], a[half:]
            b1, b2 = b[:half], b[half:]
            G1, G2 = G[:half], G[half:]
            H1, H2 = H[:half], H[half:]
            y1 = power_of_y[:half]

            c_L = fn.sum(fn.mul(fn.mul(a1, b2), y1))
            c_R = fn.sum(fn.mul(fn.mul(a2, b1), fn.mul(y1, ynhat)))

            # L = Σ (ŷ⁻¹a1)·G2 + Σ b2·H1 + c_L·g + d_L·h   (wip:98-113)
            # R = Σ (ŷ a2)·G1 + Σ b1·H2 + c_R·g + d_R·h    (wip:115-125)
            sL = jnp.concatenate(
                [fn.mul(a1, ynhat_inv), b2, c_L[None], dL[None]])
            sR = jnp.concatenate(
                [fn.mul(a2, ynhat), b1, c_R[None], dR[None]])
            S = jnp.stack([sL, sR])                       # (2, W, L)
            P = jnp.stack([
                jnp.concatenate([G2, H1, g[None], h[None]]),
                jnp.concatenate([G1, H2, g[None], h[None]]),
            ])
            W = 2 * half + 2
            if pallas and _ladder_ok(curve):
                # joint Pallas for EVERY round — under vmap the true lane
                # count is K× the per-proof W, and the XLA ladder fallback
                # dominated the profiled fold time even at tiny W
                LR = _joint_rows_msm(curve, fn.from_mont(S), P, nbits)
            else:
                WP = _next_pow2(W)
                if WP != W:
                    S = jnp.concatenate(
                        [S, jnp.zeros((2, WP - W, fn.L), jnp.int32)], axis=1)
                    P = jnp.concatenate(
                        [P, jnp.broadcast_to(ident, (2, WP - W, *ident.shape))],
                        axis=1)
                LR = ts(sm(fn.from_mont(S), P))           # (2, C, L)
            Ls.append(LR[0])
            Rs.append(LR[1])

            # fold (wip:147-164) at true width
            a = fn.add(fn.mul(a1, e_m), fn.mul(a2, fn.mul(ynhat, e_inv)))
            b = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
            fold4 = fn.from_mont(jnp.stack(
                [e_inv, fn.mul(ynhat_inv, e_m), e_m, e_inv]))
            if pallas and _ladder_ok(curve):
                from ..curves.pallas_curve import joint_ladder_msm_grouped

                # the fold G' = e⁻¹·G1[i] + ŷ⁻¹e·G2[i] (and the H twin) is
                # exactly a J=2 joint-ladder group per output: the pair
                # shares its ~253 doublings and the post-ladder adds vanish
                pair_p = jnp.concatenate([
                    jnp.stack([G1, G2], axis=1),
                    jnp.stack([H1, H2], axis=1),
                ]).reshape(4 * half, *G1.shape[-2:])
                pair_s = jnp.concatenate([
                    jnp.broadcast_to(fold4[:2][None], (half, 2, fn.L)),
                    jnp.broadcast_to(fold4[2:][None], (half, 2, fn.L)),
                ]).reshape(4 * half, fn.L)
                out = joint_ladder_msm_grouped(
                    curve, pair_s, pair_p, nbits, 2)      # (2·half, C, L)
                G, H = out[:half], out[half:]
            else:
                fs = jnp.broadcast_to(
                    fold4[:, None, :], (4, half, fn.L))
                fp = jnp.stack([G1, G2, H1, H2])
                fg = sm(fs, fp)
                G = curve.add(fg[0], fg[1])
                H = curve.add(fg[2], fg[3])
            alpha = fn.add(
                alpha, fn.add(fn.mul(es_sqr[r], dL), fn.mul(es_inv_sqr[r], dR)))

        # final A, B (wip:181-208)
        y0 = power_of_y[0]
        rcbsca = fn.add(
            fn.mul(fn.mul(r_m, y0), b[0]), fn.mul(fn.mul(s_m, y0), a[0]))
        rcs = fn.mul(fn.mul(r_m, y0), s_m)
        zf = jnp.zeros((fn.L,), jnp.int32)
        AB_s = jnp.stack([
            jnp.stack([r_m, s_m, rcbsca, delta_m]),
            jnp.stack([rcs, eta_m, zf, zf]),
        ])
        AB_p = jnp.stack([
            jnp.stack([G[0], H[0], g, h]),
            jnp.stack([g, h, ident, ident]),
        ])
        AB = ts(sm(fn.from_mont(AB_s), AB_p))
        A, B = AB[0], AB[1]

        r_prime, s_prime, d_prime = _final_scalars_core(
            curve, a, b, alpha, r_m, s_m, delta_m, eta_m, ef_m)
        L_vec = (jnp.stack(Ls) if Ls
                 else jnp.zeros((0, *A.shape), jnp.int32))
        R_vec = (jnp.stack(Rs) if Rs
                 else jnp.zeros((0, *A.shape), jnp.int32))
        return L_vec, R_vec, A, B, r_prime, s_prime, d_prime

    return f


def _prover_variant() -> str:
    """Which known-challenge whole-fold program to run: 'coeff' (the
    coefficient-form prover, wip_coeff.py — zero generator folds, every
    round a packed fixed-base MSM row), 'scan' (constant-shape lax.scan
    fold body) or 'unrolled' (true per-round widths). BPP_PROVER=coeff|
    scan|unrolled overrides; legacy BPP_PROVER_SCAN=0/1 still works."""
    import os

    v = os.environ.get("BPP_PROVER")
    if v in ("coeff", "scan", "unrolled"):
        return v
    legacy = os.environ.get("BPP_PROVER_SCAN")
    if legacy == "1":
        return "scan"
    if legacy == "0":
        return "unrolled"
    # default: unrolled fold rounds. The coefficient prover becomes the
    # default once its multi-row fixed-base MSM backend (lookup-add Pallas
    # kernel) lands — with the plain ladder backend its 2·logn rows of
    # width mn+2 cost ~2.6x the fold rounds' shrinking widths.
    return "unrolled"


@functools.lru_cache(maxsize=None)
def _wip_prove_known_jit_impl(curve, n: int, scan: bool, pallas: bool):
    prog = (_wip_prove_known_scan_prog(curve, n) if scan
            else _wip_prove_known_unrolled_prog(curve, n, pallas))
    return jax.jit(prog)


def _wip_prove_known_scan_jit(curve, n: int):
    """Single-proof whole-fold program. Default: the unrolled true-width
    fold rounds (_prover_variant()). The coefficient-form prover (no
    generator folds; one batched multi-row MSM) is opt-in via
    BPP_PROVER=coeff pending its fixed-base MSM backend; the lax.scan
    variant remains selectable — its one-body compile is minutes cheaper
    than unrolling on the TPU toolchain (the unrolled single-proof compile
    exceeded 40 min at n=1024); single-prove latency is dispatch-bound."""
    variant = _prover_variant()
    if variant == "coeff":
        from .wip_coeff import wip_prove_coeff_jit

        return wip_prove_coeff_jit(curve, n)
    return _wip_prove_known_jit_impl(
        curve, n, variant == "scan",
        False if variant == "scan" else _prover_pallas())


@functools.lru_cache(maxsize=None)
def _wip_prove_known_vmap_jit_impl(curve, n: int, scan: bool, pallas: bool):
    prog = (_wip_prove_known_scan_prog(curve, n) if scan
            else _wip_prove_known_unrolled_prog(curve, n, pallas))
    return jax.jit(jax.vmap(
        prog,
        in_axes=(0, 0, 0, 0, None, None, None, None,
                 0, 0, 0, 0, 0, 0, 0, 0),
    ))


def _wip_prove_known_scan_vmap_jit(curve, n: int):
    """Batched variant: K proofs' whole fold loops in one compiled program
    (pk generators broadcast, everything else carries a leading K axis).
    Default: the unrolled true-width fold rounds (~4x faster per proof
    than the masked constant-shape scan: 0.37 s vs 1.52 s at n=1024,
    K=16). The coefficient-form prover (wip_coeff.py — all rounds' L/R as
    one K·(2·logn+1)-row MSM over the shared pk bases, no generator folds)
    is opt-in via BPP_PROVER=coeff pending its fixed-base MSM backend;
    BPP_PROVER=scan selects the constant-shape body."""
    variant = _prover_variant()
    if variant == "coeff":
        from .wip_coeff import wip_prove_coeff_vmap_jit

        return wip_prove_coeff_vmap_jit(curve, n)
    return _wip_prove_known_vmap_jit_impl(
        curve, n, variant == "scan",
        False if variant == "scan" else _prover_pallas())


def wip_prove(curve, pk, a, b, power_of_y, alpha, transcript, rng) -> WipProof:
    """Fold loop (wip:36-227). a, b, power_of_y: (n, L) Montgomery arrays;
    alpha: (L,). Challenges/blinds come from host transcript/rng. (The
    reference passes P = Â in as well, wip:44 — dead: the prover's running
    P += e²L + e⁻²R at wip:137-142 is never read, so neither is P.)

    Two execution modes:
    - challenges known ahead (DeterministicTranscript replay): the whole
      loop is ONE compiled program (_wip_prove_known_jit);
    - interactive Fiat-Shamir (ShaTranscript): ONE fused compiled program
      per round (the previous round's fold + this round's L/R, after the
      host hashes L/R into the challenge) plus a fused last-fold + A/B
      program — log2(n)+1 dispatches; BPP_FUSE_ROUNDS=0 splits each round
      into separate L/R and fold programs again.

    Compile discipline either way: L and R are ONE batched (2, W) MSM per
    round, and the generator folds are ONE (4, n/2-padded) scalar-mul per
    round padded to a per-proof-size constant."""
    fn = curve.fn
    n = a.shape[0]
    assert n & (n - 1) == 0, "length must be a power of two"
    fold_pad = _fold_pad(n)
    logn = n.bit_length() - 1

    import os

    fuse = _fuse_ok()
    # the scan program is one small compiled body — on by default on every
    # backend; BPP_FUSE_PROVER=0 forces the eager loop (differential debug)
    known = (getattr(transcript, "challenges_known_ahead", False)
             and getattr(rng, "blinds_known_ahead", False)
             and os.environ.get("BPP_FUSE_PROVER") != "0")
    if known and logn > 0:
        dLs, dRs = zip(*[rng.round_blinds() for _ in range(logn)])
        es = [transcript.round_challenge(curve, None, None) % fn.p
              for _ in range(logn)]
        r, s, delta, eta = rng.final_blinds()
        ef = transcript.final_challenge(curve, None, None) % fn.p
        L_vec, R_vec, A, B, r_prime, s_prime, d_prime = (
            _wip_prove_known_scan_jit(curve, n)
        )(
            a, b, power_of_y, alpha, pk.G_vec, pk.H_vec, pk.g, pk.h,
            jnp.asarray(fn.encode(list(es))),
            jnp.asarray(fn.encode(list(dLs))),
            jnp.asarray(fn.encode(list(dRs))),
            jnp.asarray(fn.encode(r)), jnp.asarray(fn.encode(s)),
            jnp.asarray(fn.encode(delta)), jnp.asarray(fn.encode(eta)),
            jnp.asarray(fn.encode(ef)),
        )
        return WipProof(
            L_vec=L_vec, R_vec=R_vec, A=A, B=B,
            r_prime=r_prime, s_prime=s_prime, d_prime=d_prime,
        )

    if (getattr(transcript, "device_graph", False) and logn > 0 and fuse
            and getattr(transcript, "_counter", None) == 2):
        # fs256: the transcript hashes INSIDE the compiled program — the
        # whole sound fold loop is ONE dispatch (protocol/fs256.py)
        from .fs256 import wip_prove_fs256_jit

        dLs, dRs = zip(*[rng.round_blinds() for _ in range(logn)])
        r, s, delta, eta = rng.final_blinds()
        state = jnp.asarray(transcript.state_words())
        L_vec, R_vec, A, B, r_p, s_p, d_p, state_out = wip_prove_fs256_jit(
            curve, n
        )(
            a, b, power_of_y, alpha, pk.G_vec, pk.H_vec, pk.g, pk.h, state,
            jnp.asarray(fn.encode(list(dLs))),
            jnp.asarray(fn.encode(list(dRs))),
            jnp.asarray(fn.encode(r)), jnp.asarray(fn.encode(s)),
            jnp.asarray(fn.encode(delta)), jnp.asarray(fn.encode(eta)),
        )
        transcript.set_state_words(np.asarray(state_out), logn + 1)
        return WipProof(
            L_vec=L_vec, R_vec=R_vec, A=A, B=B,
            r_prime=r_p, s_prime=s_p, d_prime=d_p,
        )

    G = pk.G_vec
    H = pk.H_vec
    L_list: List[jnp.ndarray] = []
    R_list: List[jnp.ndarray] = []

    # eager cores on CPU (shared per-op programs); per-round compiled
    # programs on TPU (two dispatches per round instead of ~30)
    lr = (lambda nn: _round_lr_jit(curve, nn)) if fuse else (
        lambda nn: functools.partial(_round_lr_core, curve))
    fold = (lambda nn: _round_fold_jit(curve, nn, fold_pad)) if fuse else (
        lambda nn: functools.partial(_round_fold_core, curve, fold_pad))

    def enc(x):
        return jnp.asarray(fn.encode(x))

    if _fuse_rounds_ok() and n > 1:
        # fused flow: L/R of round r+1 ride in the same program as the
        # fold of round r — log2(n)+1 dispatches instead of 2·log2(n)
        fold_lr = (lambda nn: _round_fold_lr_jit(curve, nn, fold_pad)
                   ) if fuse else (
            lambda nn: functools.partial(_round_fold_lr_core, curve,
                                         fold_pad))
        fold_final = (lambda nn: _round_fold_final_jit(curve, nn, fold_pad)
                      ) if fuse else (
            lambda nn: functools.partial(_round_fold_final_core, curve,
                                         fold_pad))
        d_L, d_R = rng.round_blinds()
        d_L_m, d_R_m = enc(d_L), enc(d_R)
        L, R, y_nhat, y_nhat_inv = lr(n)(
            a, b, power_of_y, G, H, pk.g, pk.h, d_L_m, d_R_m
        )
        L_list.append(L)
        R_list.append(R)
        e_m = enc(transcript.round_challenge(curve, L, R) % fn.p)
        while n > 2:
            d_L2, d_R2 = rng.round_blinds()
            d_L2_m, d_R2_m = enc(d_L2), enc(d_R2)
            (L, R, a, b, power_of_y, G, H, alpha,
             y_nhat, y_nhat_inv) = fold_lr(n)(
                a, b, power_of_y, G, H, pk.g, pk.h, alpha,
                d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv, d_L2_m, d_R2_m,
            )
            L_list.append(L)
            R_list.append(R)
            e_m = enc(transcript.round_challenge(curve, L, R) % fn.p)
            d_L_m, d_R_m = d_L2_m, d_R2_m
            n //= 2
        r, s, delta, eta = rng.final_blinds()
        r_m, s_m = enc(r), enc(s)
        delta_m, eta_m = enc(delta), enc(eta)
        A, B, a, b, alpha = fold_final(n)(
            a, b, power_of_y, G, H, pk.g, pk.h, alpha,
            d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv,
            r_m, s_m, delta_m, eta_m,
        )
    else:
        while n != 1:
            d_L, d_R = rng.round_blinds()
            d_L_m = jnp.asarray(fn.encode(d_L))
            d_R_m = jnp.asarray(fn.encode(d_R))
            L, R, y_nhat, y_nhat_inv = lr(n)(
                a, b, power_of_y, G, H, pk.g, pk.h, d_L_m, d_R_m
            )
            L_list.append(L)
            R_list.append(R)

            e = transcript.round_challenge(curve, L, R) % fn.p
            e_m = jnp.asarray(fn.encode(e))
            a, b, power_of_y, G, H, alpha = fold(n)(
                a, b, power_of_y, G, H, alpha,
                d_L_m, d_R_m, e_m, y_nhat, y_nhat_inv,
            )
            n //= 2

        r, s, delta, eta = rng.final_blinds()
        r_m = jnp.asarray(fn.encode(r))
        s_m = jnp.asarray(fn.encode(s))
        delta_m = jnp.asarray(fn.encode(delta))
        eta_m = jnp.asarray(fn.encode(eta))

        final_ab = _final_ab_jit(curve) if fuse else functools.partial(
            _final_ab_core, curve)
        A, B = final_ab(
            a, b, power_of_y[0], G[0], H[0], pk.g, pk.h,
            r_m, s_m, delta_m, eta_m,
        )

    e = transcript.final_challenge(curve, A, B) % fn.p
    e_m = jnp.asarray(fn.encode(e))
    final_scalars = _final_scalars_jit(curve) if fuse else functools.partial(
        _final_scalars_core, curve)
    r_prime, s_prime, d_prime = final_scalars(
        a, b, alpha, r_m, s_m, delta_m, eta_m, e_m
    )

    return WipProof(
        L_vec=jnp.stack(L_list) if L_list else jnp.zeros((0, *A.shape), jnp.int32),
        R_vec=jnp.stack(R_list) if R_list else jnp.zeros((0, *A.shape), jnp.int32),
        A=A,
        B=B,
        r_prime=r_prime,
        s_prime=s_prime,
        d_prime=d_prime,
    )


def verification_scalars(curve, proof: WipProof, n: int, transcript):
    """Challenge replay + vectorized s_vec expansion (wip:330-382).

    Returns (challenges_sqr (logn,L), challenges_inv_sqr (logn,L),
    s_vec (n,L), e (L,)) — all Montgomery form.
    """
    fn = curve.fn
    logn = proof.rounds
    if n != (1 << logn):
        raise VerificationError()

    es = [
        transcript.round_challenge(curve, proof.L_vec[i], proof.R_vec[i]) % fn.p
        for i in range(logn)
    ]
    if any(e == 0 for e in es):
        raise VerificationError()
    challenges = jnp.asarray(fn.encode(es))  # (logn, L)
    allinv, challenges_inv = fn.batch_invert(challenges)
    challenges_sqr = fn.mul(challenges, challenges)
    challenges_inv_sqr = fn.mul(challenges_inv, challenges_inv)

    e = transcript.final_challenge(curve, proof.A, proof.B) % fn.p
    if e == 0:
        raise VerificationError()

    # s_vec[i] = allinv · Π_{j: bit j of i set} challenges_sqr[logn-1-j]
    # (the closed form of the recurrence at wip:372-380)
    s = jnp.broadcast_to(allinv, (n, fn.L))
    idx = np.arange(n)
    for j in range(logn):
        bit = jnp.asarray((idx >> j) & 1, dtype=bool)
        s = fn.select(bit, fn.mul(s, challenges_sqr[logn - 1 - j]), s)

    return challenges_sqr, challenges_inv_sqr, s, jnp.asarray(fn.encode(e))


def _wip_prove_known_kbatched_prog(curve, n: int, K: int,
                                   lr_xla: bool = False):
    """K proofs' whole fold loops as ONE BATCHED-NATIVE program — explicit
    leading K axis, NO vmap.

    Why not vmap the single-proof program: under vmap each Pallas call
    becomes K independent grid instances, and a small-grid instance costs
    ~4 ms regardless of size (measured: J2 kernel at 16x32 groups = 67 ms
    device vs 2 ms for the same work flattened to one 512-group grid).
    With 2 calls x log2(n) rounds x K=16 instances that overhead WAS the
    fold time. Here every round's points/scalars carry the K axis and
    joint_ladder_msm_grouped flattens (K, rows, W) into ONE kernel grid.
    Outputs are identical to the vmapped unrolled program."""
    fn = curve.fn
    logn = n.bit_length() - 1
    nbits = fn.order_bits
    hs = [n >> (r + 1) for r in range(logn)]
    from ..curves.pallas_curve import joint_ladder_msm_grouped

    def f(a, b, power_of_y, alpha, G, H, g, h,
          es_m, dLs_m, dRs_m, r_m, s_m, delta_m, eta_m, ef_m):
        # a, b, power_of_y: (K, n, L); alpha: (K, L); es/dLs/dRs: (K, logn, L)
        _, es_inv = fn.batch_invert(es_m, axis=1)
        es_sqr = fn.mul(es_m, es_m)
        es_inv_sqr = fn.mul(es_inv, es_inv)
        ynhats = power_of_y[:, np.array([h_ - 1 for h_ in hs])]  # (K,logn,L)
        _, ynhat_invs = fn.batch_invert(ynhats, axis=1)

        Gk = jnp.broadcast_to(G, (K, *G.shape))
        Hk = jnp.broadcast_to(H, (K, *H.shape))
        gk = jnp.broadcast_to(g, (K, *g.shape))
        hk = jnp.broadcast_to(h, (K, *h.shape))

        Ls, Rs = [], []
        for r in range(logn):
            half = hs[r]
            e_m, e_inv = es_m[:, r], es_inv[:, r]          # (K, L)
            ynhat, ynhat_inv = ynhats[:, r], ynhat_invs[:, r]
            dL, dR = dLs_m[:, r], dRs_m[:, r]
            a1, a2 = a[:, :half], a[:, half:]
            b1, b2 = b[:, :half], b[:, half:]
            G1, G2 = Gk[:, :half], Gk[:, half:]
            H1, H2 = Hk[:, :half], Hk[:, half:]
            y1 = power_of_y[:, :half]

            c_L = fn.sum(fn.mul(fn.mul(a1, b2), y1), axis=1)
            c_R = fn.sum(fn.mul(fn.mul(a2, b1),
                                fn.mul(y1, ynhat[:, None])), axis=1)

            sL = jnp.concatenate(
                [fn.mul(a1, ynhat_inv[:, None]), b2,
                 c_L[:, None], dL[:, None]], axis=1)
            sR = jnp.concatenate(
                [fn.mul(a2, ynhat[:, None]), b1,
                 c_R[:, None], dR[:, None]], axis=1)
            S = jnp.stack([sL, sR], axis=1)                # (K, 2, W, L)
            P = jnp.stack([
                jnp.concatenate([G2, H1, gk[:, None], hk[:, None]], axis=1),
                jnp.concatenate([G1, H2, gk[:, None], hk[:, None]], axis=1),
            ], axis=1)                                     # (K, 2, W, C, L)
            if lr_xla:
                # bisect aid: the plain padded scan ladder + tree for L/R
                # (natively batched over K·2 rows) instead of the joint
                # Pallas kernel — isolates the kernel-in-graph suspicion
                from ..msm.engine import (
                    _next_pow2,
                    _scalar_mul_jit,
                    _tree_sum_jit,
                )

                W = S.shape[2]
                Wp = _next_pow2(W)
                if Wp != W:
                    S = jnp.concatenate(
                        [S, jnp.zeros((K, 2, Wp - W, fn.L), jnp.int32)],
                        axis=2)
                    P = jnp.concatenate(
                        [P, jnp.broadcast_to(
                            jnp.asarray(curve.identity_np),
                            (K, 2, Wp - W, *P.shape[-2:]))], axis=2)
                LR = _tree_sum_jit(curve)(
                    _scalar_mul_jit(curve, nbits)(fn.from_mont(S), P))
            else:
                LR = _joint_rows_msm(curve, fn.from_mont(S), P, nbits)
            Ls.append(LR[:, 0])
            Rs.append(LR[:, 1])

            # folds
            a = fn.add(fn.mul(a1, e_m[:, None]),
                       fn.mul(a2, fn.mul(ynhat, e_inv)[:, None]))
            b = fn.add(fn.mul(b1, e_inv[:, None]), fn.mul(b2, e_m[:, None]))
            fold4 = fn.from_mont(jnp.stack(
                [e_inv, fn.mul(ynhat_inv, e_m), e_m, e_inv], axis=1))
            # pairs (G1[i], G2[i]) and (H1[i], H2[i]): (K, 2·half, 2, ...)
            pair_p = jnp.concatenate([
                jnp.stack([G1, G2], axis=2),
                jnp.stack([H1, H2], axis=2),
            ], axis=1).reshape(K, 4 * half, *G.shape[-2:])
            pair_s = jnp.concatenate([
                jnp.broadcast_to(fold4[:, None, :2], (K, half, 2, fn.L)),
                jnp.broadcast_to(fold4[:, None, 2:], (K, half, 2, fn.L)),
            ], axis=1).reshape(K, 4 * half, fn.L)
            out = joint_ladder_msm_grouped(curve, pair_s, pair_p, nbits, 2)
            Gk, Hk = out[:, :half], out[:, half:]
            alpha = fn.add(alpha, fn.add(
                fn.mul(es_sqr[:, r], dL), fn.mul(es_inv_sqr[:, r], dR)))

        # final A, B (wip:181-208)
        y0 = power_of_y[:, 0]
        a0, b0 = a[:, 0], b[:, 0]
        rcbsca = fn.add(
            fn.mul(fn.mul(r_m, y0), b0), fn.mul(fn.mul(s_m, y0), a0))
        rcs = fn.mul(fn.mul(r_m, y0), s_m)
        ident = jnp.asarray(curve.identity_np)
        AB_s = jnp.stack([
            jnp.stack([r_m, s_m, rcbsca, delta_m], axis=1),
            jnp.stack([rcs, eta_m, fn.zero_like(r_m),
                       fn.zero_like(r_m)], axis=1),
        ], axis=1)                                         # (K, 2, 4, L)
        AB_p = jnp.stack([
            jnp.stack([Gk[:, 0], Hk[:, 0], gk, hk], axis=1),
            jnp.stack([gk, hk,
                       jnp.broadcast_to(ident, gk.shape),
                       jnp.broadcast_to(ident, gk.shape)], axis=1),
        ], axis=1)                                         # (K, 2, 4, C, L)
        AB = _joint_rows_msm(curve, fn.from_mont(AB_s), AB_p, nbits)
        A, B = AB[:, 0], AB[:, 1]

        r_prime = fn.add(r_m, fn.mul(a0, ef_m))
        s_prime = fn.add(s_m, fn.mul(b0, ef_m))
        d_prime = fn.add(eta_m, fn.add(
            fn.mul(delta_m, ef_m), fn.mul(alpha, fn.mul(ef_m, ef_m))))
        L_vec = jnp.stack(Ls, axis=1) if Ls else jnp.zeros(
            (K, 0, *A.shape[-2:]), jnp.int32)
        R_vec = jnp.stack(Rs, axis=1) if Rs else jnp.zeros(
            (K, 0, *A.shape[-2:]), jnp.int32)
        return L_vec, R_vec, A, B, r_prime, s_prime, d_prime

    return f


@functools.lru_cache(maxsize=None)
def _wip_prove_known_kbatched_jit_impl(curve, n: int, K: int, lr_xla: bool):
    return jax.jit(_wip_prove_known_kbatched_prog(curve, n, K, lr_xla))


def _wip_prove_known_kbatched_jit(curve, n: int, K: int):
    """BPP_KBATCHED_LR=xla (the bisect aid) is read at CALL time and is part
    of the compiled-program cache key, so toggling it mid-process takes
    effect — a trace-time read inside the lru-cached builder would silently
    keep running the stale cached program (round-4 advisor finding)."""
    import os

    return _wip_prove_known_kbatched_jit_impl(
        curve, n, K, os.environ.get("BPP_KBATCHED_LR") == "xla")
