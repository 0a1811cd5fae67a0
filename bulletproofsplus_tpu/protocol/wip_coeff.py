"""Coefficient-form WIP prover: the fold loop with ZERO generator folds.

The reference prover (weighted_inner_product_proof.rs:79-172) folds the
generator vectors every round — G'_i = e⁻¹·G_i + ŷ⁻¹e·G_{i+n/2}
(wip:147-164) — which costs 4·n̂ full scalar-muls per round and dominates
proving time. But each folded generator is, by construction, a LINEAR
COMBINATION of the ORIGINAL public-key generators whose coefficients are
products of challenge factors:

    G^{(r)}_i = Σ_{j ≡ i (mod n_r)} wG_j · G_j,
    wG_j = Π_{t<r} (β_t(j) ? ŷ_t⁻¹·e_t : e_t⁻¹),     β_t(j) = bit (logn−1−t) of j

(and symmetrically wH_j with factors e_t⁻¹ / e_t). Substituting into the
round commitments turns every L_r / R_r into a FIXED-BASE MSM over the
original (G_vec, H_vec, g, h) with field-only coefficient bookkeeping:

    L_r = Σ_{β_r(j)=1} (ŷ_r⁻¹·a_r[j mod n_{r+1}]·wG_j)·G_j
        + Σ_{β_r(j)=0} (b_r[(j mod n_{r+1})+n_{r+1}]·wH_j)·H_j + c_L·g + d_L·h
    R_r = Σ_{β_r(j)=0} (ŷ_r·a_r[(j mod n_{r+1})+n_{r+1}]·wG_j)·G_j
        + Σ_{β_r(j)=1} (b_r[j mod n_{r+1}]·wH_j)·H_j + c_R·g + d_R·h

The nonzero-coefficient sets are STATIC bit patterns (known at trace time),
so each round's MSM packs to exactly n+2 lanes via constant-index gathers.
The whole prover becomes: an O(n·logn) field program computing every round's
packed scalar row, then ONE batched (2·logn+1)-row MSM over shared bases —
the shape that Pippenger bucket accumulation and fixed-base tables eat for
breakfast, with no sequential point-dependency between rounds at all (in
known-challenge mode the rounds are not even ordered on device).

Point-op count per proof at mn = 1024: rows·(mn+2) ≈ 21·1026 ≈ 21.5k MSM
lanes vs the fold prover's Σ_r (8·n̂+4) ≈ 8·mn ≈ 8.2k LADDER lanes — but a
Pippenger/bucket lane costs ~43 adds while a ladder lane costs ~335
mixed dbl/add ops: ~926k adds vs ~2.7M ops, with all doublings shared.

Outputs are byte-identical to the fold prover (same scalars, affine-equal
points — MSM lane padding may rescale projective representatives).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..msm import msm


def _rows_msm(curve, scalars, points, nbits: int):
    """Batched multi-row MSM backend: Pippenger buckets when the total lane
    count justifies the bucket overhead, else the windowed ladder."""
    from ..msm.pippenger import (
        msm_pippenger,
        pippenger_enabled,
        pippenger_min_lanes,
    )

    lanes = 1
    for d in points.shape[:-2]:
        lanes *= d
    if pippenger_enabled() and lanes >= pippenger_min_lanes():
        return msm_pippenger(curve, scalars, points, nbits)
    return msm(curve, scalars, points, nbits)


def wip_prove_coeff_prog(curve, n: int):
    """The whole known-challenge fold loop as ONE coefficient-form program.

    Same signature/outputs as wip._wip_prove_known_unrolled_prog: inputs are
    Montgomery-form (a, b, y-powers, α̂, generators, per-round challenges e,
    blinds d_L/d_R, final blinds r/s/δ/η, final challenge e_f)."""
    fn = curve.fn
    logn = n.bit_length() - 1
    nbits = fn.order_bits
    hs = [n >> (r + 1) for r in range(logn)]

    j = np.arange(n)
    # β_r(j): bit (logn-1-r) — whether j sits in the high half at round r
    betas = [((j >> (logn - 1 - r)) & 1).astype(bool) for r in range(logn)]
    # packed lane → original index: high-half set for one part, low for the
    # other; jlow = j mod n_{r+1} indexes the compact a/b halves
    idx_hi = [np.nonzero(betas[r])[0] for r in range(logn)]    # (n/2,)
    idx_lo = [np.nonzero(~betas[r])[0] for r in range(logn)]
    low_hi = [idx_hi[r] % hs[r] for r in range(logn)]
    low_lo = [idx_lo[r] % hs[r] for r in range(logn)]

    def f(a, b, power_of_y, alpha, G, H, g, h,
          es_m, dLs_m, dRs_m, r_m, s_m, delta_m, eta_m, ef_m):
        _, es_inv = fn.batch_invert(es_m)
        es_sqr = fn.mul(es_m, es_m)
        es_inv_sqr = fn.mul(es_inv, es_inv)
        ynhats = power_of_y[np.array([h_ - 1 for h_ in hs])]   # (logn, L)
        _, ynhat_invs = fn.batch_invert(ynhats)

        one = jnp.asarray(fn.one_np)
        wG = jnp.broadcast_to(one, (n, fn.L))
        wH = jnp.broadcast_to(one, (n, fn.L))

        S_rows, P_rows = [], []
        for r in range(logn):
            half = hs[r]
            e_m, e_inv = es_m[r], es_inv[r]
            ynhat, ynhat_inv = ynhats[r], ynhat_invs[r]
            dL, dR = dLs_m[r], dRs_m[r]
            a1, a2 = a[:half], a[half:]
            b1, b2 = b[:half], b[half:]
            y1 = power_of_y[:half]

            c_L = fn.sum(fn.mul(fn.mul(a1, b2), y1))
            c_R = fn.sum(fn.mul(fn.mul(a2, b1), fn.mul(y1, ynhat)))

            # packed rows (constant-index gathers; wip:98-125 expanded to
            # original bases via the coefficient identity above)
            sGL = fn.mul(fn.mul(a1[low_hi[r]], ynhat_inv), wG[idx_hi[r]])
            sHL = fn.mul(b2[low_lo[r]], wH[idx_lo[r]])
            sGR = fn.mul(fn.mul(a2[low_lo[r]], ynhat), wG[idx_lo[r]])
            sHR = fn.mul(b1[low_hi[r]], wH[idx_hi[r]])
            S_rows.append(jnp.concatenate(
                [sGL, sHL, c_L[None], dL[None]]))
            S_rows.append(jnp.concatenate(
                [sGR, sHR, c_R[None], dR[None]]))
            P_rows.append(jnp.concatenate(
                [G[idx_hi[r]], H[idx_lo[r]], g[None], h[None]]))
            P_rows.append(jnp.concatenate(
                [G[idx_lo[r]], H[idx_hi[r]], g[None], h[None]]))

            # weight update AFTER emitting round r (L/R use w^{(r)});
            # G-fold factor: β=0 → e⁻¹, β=1 → ŷ⁻¹e; H-fold: e / e⁻¹
            bsel = jnp.asarray(betas[r])
            wG = fn.mul(wG, fn.select(
                bsel, fn.mul(ynhat_inv, e_m), e_inv))
            wH = fn.mul(wH, fn.select(bsel, e_inv, e_m))

            # compact field folds (wip:147-158)
            a = fn.add(fn.mul(a1, e_m), fn.mul(a2, fn.mul(ynhat, e_inv)))
            b = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
            alpha = fn.add(alpha, fn.add(
                fn.mul(es_sqr[r], dL), fn.mul(es_inv_sqr[r], dR)))

        # final A (wip:189-208): G^{(logn)}_0 = Σ_j wG_j·G_j, so A is one
        # more fixed-base row of width 2n+2
        y0 = power_of_y[0]
        rcbsca = fn.add(
            fn.mul(fn.mul(r_m, y0), b[0]), fn.mul(fn.mul(s_m, y0), a[0]))
        rcs = fn.mul(fn.mul(r_m, y0), s_m)
        sA = jnp.concatenate(
            [fn.mul(wG, r_m), fn.mul(wH, s_m), rcbsca[None], delta_m[None]])
        pA = jnp.concatenate([G, H, g[None], h[None]])

        if logn > 0:
            LR = _rows_msm(
                curve, jnp.stack([fn.from_mont(s) for s in S_rows]),
                jnp.stack(P_rows), nbits)            # (2·logn, C, L)
            L_vec, R_vec = LR[0::2], LR[1::2]
        else:
            ident = jnp.asarray(curve.identity_np)
            L_vec = R_vec = jnp.zeros((0, *ident.shape), jnp.int32)
        A = _rows_msm(curve, fn.from_mont(sA), pA, nbits)

        # B = rcs·g + η·h (2 lanes; shared small-MSM program)
        B = msm(curve, fn.from_mont(jnp.stack([rcs, eta_m])),
                jnp.stack([g, h]), nbits)

        r_prime = fn.add(r_m, fn.mul(a[0], ef_m))
        s_prime = fn.add(s_m, fn.mul(b[0], ef_m))
        d_prime = fn.add(eta_m, fn.add(
            fn.mul(delta_m, ef_m), fn.mul(alpha, fn.mul(ef_m, ef_m))))
        return L_vec, R_vec, A, B, r_prime, s_prime, d_prime

    return f


@functools.lru_cache(maxsize=None)
def wip_prove_coeff_jit(curve, n: int):
    return jax.jit(wip_prove_coeff_prog(curve, n))


@functools.lru_cache(maxsize=None)
def wip_prove_coeff_vmap_jit(curve, n: int):
    """K proofs' coefficient provers in one program (pk broadcast)."""
    return jax.jit(jax.vmap(
        wip_prove_coeff_prog(curve, n),
        in_axes=(0, 0, 0, 0, None, None, None, None,
                 0, 0, 0, 0, 0, 0, 0, 0),
    ))
