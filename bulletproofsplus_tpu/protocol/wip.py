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
from typing import List

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


def wip_prove(curve, pk, a, b, power_of_y, alpha, P, transcript, rng) -> WipProof:
    """Fold loop (wip:36-227). a, b, power_of_y: (n, L) Montgomery arrays;
    alpha: (L,); P: (C, L). Challenges/blinds come from host transcript/rng.

    Compile discipline: L and R are ONE batched (2, W) MSM per round, and the
    generator folds are ONE (4, n/2-padded) scalar-mul per round padded to a
    per-proof-size constant — so the whole fold loop runs on two or three
    compiled programs regardless of round. The reference's running
    P += e²L + e⁻²R (wip:137-142) is dropped: P is never read again by the
    prover (the proof output is L/R/A/B/r'/s'/δ' only), so it is dead work."""
    from ..msm.engine import small_floor

    fn = curve.fn
    n = a.shape[0]
    assert n & (n - 1) == 0, "length must be a power of two"
    fold_pad = max(small_floor(), n // 2)  # one fold program per proof size
    G = pk.G_vec
    H = pk.H_vec
    g1 = pk.g[None]
    h1 = pk.h[None]

    L_list: List[jnp.ndarray] = []
    R_list: List[jnp.ndarray] = []

    while n != 1:
        n //= 2
        a1, a2 = a[:n], a[n:]
        b1, b2 = b[:n], b[n:]
        y1 = power_of_y[:n]
        y2 = power_of_y[n:]
        G1, G2 = G[:n], G[n:]
        H1, H2 = H[:n], H[n:]

        c_L = _wip(fn, a1, b2, y1)
        c_R = _wip(fn, a2, b1, y2)
        d_L, d_R = rng.round_blinds()
        d_L_m = jnp.asarray(fn.encode(d_L))
        d_R_m = jnp.asarray(fn.encode(d_R))

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
            jnp.concatenate([G2, H1, g1, h1], axis=0),
            jnp.concatenate([G1, H2, g1, h1], axis=0),
        ])
        LR = msm(curve, fn.from_mont(LR_scalars), LR_points)
        L, R = LR[0], LR[1]

        L_list.append(L)
        R_list.append(R)

        e = transcript.round_challenge(curve, L, R) % fn.p
        e_m = jnp.asarray(fn.encode(e))
        e_inv = fn.inv(e_m)
        e_sqr = fn.mul(e_m, e_m)
        e_sqr_inv = fn.mul(e_inv, e_inv)

        y_nhat_e_inv = fn.mul(y_nhat, e_inv)
        y_nhat_inv_e = fn.mul(y_nhat_inv, e_m)

        # fold a, b (field) and G, H (group)   (wip:147-164)
        a = fn.add(fn.mul(a1, e_m), fn.mul(a2, y_nhat_e_inv))
        b = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
        fold_scalars = fn.from_mont(
            jnp.stack([e_inv, y_nhat_inv_e, e_m, e_inv])
        )[:, None, :]
        fold_points = jnp.stack([G1, G2, H1, H2])  # (4, n, C, L)
        fold_points = _pad_points(curve, fold_points, fold_pad)
        fg = scalar_mul(curve, fold_scalars, fold_points)
        G = curve.add(fg[0], fg[1])[:n]
        H = curve.add(fg[2], fg[3])[:n]
        power_of_y = y1
        alpha = fn.add(alpha, fn.add(fn.mul(e_sqr, d_L_m), fn.mul(e_sqr_inv, d_R_m)))

    r, s, delta, eta = rng.final_blinds()
    r_m = jnp.asarray(fn.encode(r))
    s_m = jnp.asarray(fn.encode(s))
    delta_m = jnp.asarray(fn.encode(delta))
    eta_m = jnp.asarray(fn.encode(eta))
    y0 = power_of_y[0]

    # A = r·G0 + s·H0 + (r·y·b0 + s·y·a0)·g + δ·h ; B = (r·y·s)·g + η·h (wip:181-208)
    rcbsca = fn.add(
        fn.mul(fn.mul(r_m, y0), b[0]), fn.mul(fn.mul(s_m, y0), a[0])
    )
    rcs = fn.mul(fn.mul(r_m, y0), s_m)
    A = msm(
        curve,
        fn.from_mont(jnp.stack([r_m, s_m, rcbsca, delta_m])),
        jnp.stack([G[0], H[0], pk.g, pk.h]),
    )
    B = msm(
        curve,
        fn.from_mont(jnp.stack([rcs, eta_m])),
        jnp.stack([pk.g, pk.h]),
    )

    e = transcript.final_challenge(curve, A, B) % fn.p
    e_m = jnp.asarray(fn.encode(e))
    r_prime = fn.add(r_m, fn.mul(a[0], e_m))
    s_prime = fn.add(s_m, fn.mul(b[0], e_m))
    d_prime = fn.add(
        eta_m, fn.add(fn.mul(delta_m, e_m), fn.mul(alpha, fn.mul(e_m, e_m)))
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
