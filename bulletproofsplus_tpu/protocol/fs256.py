"""In-graph Fiat-Shamir: the WHOLE sound fold loop as one compiled program.

The interactive prover's structural cost is one host round-trip per round
(hash L/R into the challenge). With the fs256 transcript
(transcript.py::Fs256Transcript — SHA-256 over static word-aligned
messages), the transcript itself runs as jnp uint32 ops (hashers_device.py)
INSIDE the fold program: round challenges are derived in-graph, and the
sound prover becomes a single device dispatch per proof — the same shape as
the known-challenge replay path, restoring what the reference stripped
(weighted_inner_product_proof.rs:69-71,339-348) at full soundness WITHOUT
the interactive path's latency.

The per-round extra device work is tiny: one batched base-field Fermat
inversion for the (L, R) affine conversion, ~6 SHA-256 compressions, and a
16-modmul digest reduction into the scalar field (hashers_device.py).

The y/z statement challenge stays host-side (range.py absorbs the m
commitments + A and hands the 32-byte state over via
Fs256Transcript.state_words) — one fetch total before the fold program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..hashers_device import (
    digest_to_field_mont,
    field_be_words,
    sha256_words,
    tag_words,
)


def _affine_words(curve, pts):
    """Points (..., k, C, L) Montgomery-limb → coordinate words
    (..., k·2·nw) uint32, in (x_1, y_1, x_2, y_2, ...) order. Identity maps
    to the family's natural affine under Fermat 0⁻¹ = 0 (edwards (0, 1),
    weierstrass (0, 0)) — mirrored by Fs256Transcript._coord_bytes."""
    fp = curve.fp
    Z = pts[..., 2, :]
    zi = fp.inv(Z)                      # (..., k, L); 0 → 0 (weier identity)
    x = fp.from_mont(fp.mul(pts[..., 0, :], zi))
    y = fp.from_mont(fp.mul(pts[..., 1, :], zi))
    xw = field_be_words(fp, x)          # (..., k, nw)
    yw = field_be_words(fp, y)
    xy = jnp.concatenate([xw[..., None, :], yw[..., None, :]], axis=-2)
    k, nw = xy.shape[-3], xy.shape[-1]
    return xy.reshape(*xy.shape[:-3], k * 2 * nw)


def _absorb_points(curve, state, tag4: bytes, pts):
    """state = SHA256(state || tag4 || x_1 || y_1 || ...) for a static
    number of points pts (..., k, C, L)."""
    coords = _affine_words(curve, pts)
    lead = coords.shape[:-1]
    tw = jnp.broadcast_to(jnp.asarray(tag_words(tag4)), (*lead, 1))
    msg = jnp.concatenate([state, tw, coords], axis=-1)
    return sha256_words(msg, 4 * msg.shape[-1])


def _challenge_mont(fn, state, tag4: bytes, counter: int):
    """Counter-tagged challenge: advances state and squeezes a 512-bit
    digest reduced into the scalar field (Montgomery form). 0 → 1, as on
    the host twin."""
    lead = state.shape[:-1]

    def bc(arr):
        return jnp.broadcast_to(jnp.asarray(arr), (*lead, arr.shape[-1]))

    msg = jnp.concatenate([
        state, bc(tag_words(b"chal")), bc(tag_words(tag4)),
        bc(np.array([counter], dtype=np.uint32)),
    ], axis=-1)
    state = sha256_words(msg, 4 * msg.shape[-1])
    d1 = sha256_words(jnp.concatenate(
        [state, bc(np.array([1], dtype=np.uint32))], axis=-1), 36)
    d2 = sha256_words(jnp.concatenate(
        [state, bc(np.array([2], dtype=np.uint32))], axis=-1), 36)
    e = digest_to_field_mont(fn, jnp.concatenate([d1, d2], axis=-1))
    e = fn.select(fn.eq(e, fn.zero_like(e)), fn.one_like(e), e)
    return state, e


def _wip_prove_fs256_prog(curve, n: int):
    """The sound fold loop with in-graph challenges — ONE program.

    Inputs mirror _wip_prove_known_unrolled_prog (wip.py) except the
    challenge vector: `state` is the fs256 transcript state after the y/z
    statement challenge (counter = 2), and the per-round / final challenges
    are derived in-graph. Returns the proof arrays plus the final state."""
    from .wip import (
        _final_ab_core,
        _final_scalars_core,
        _fold_pad,
        _round_fold_core,
        _round_lr_core,
    )

    fn = curve.fn
    logn = n.bit_length() - 1
    fold_pad = _fold_pad(n)

    def f(a, b, power_of_y, alpha, G, H, g, h, state,
          dLs_m, dRs_m, r_m, s_m, delta_m, eta_m):
        Ls, Rs = [], []
        for r in range(logn):
            L, R, y_nhat, y_nhat_inv = _round_lr_core(
                curve, a, b, power_of_y, G, H, g, h, dLs_m[r], dRs_m[r])
            Ls.append(L)
            Rs.append(R)
            state = _absorb_points(
                curve, state, b"LR  ", jnp.stack([L, R], axis=-3))
            state, e_m = _challenge_mont(fn, state, b"e   ", r + 3)
            a, b, power_of_y, G, H, alpha = _round_fold_core(
                curve, fold_pad, a, b, power_of_y, G, H, alpha,
                dLs_m[r], dRs_m[r], e_m, y_nhat, y_nhat_inv)
        A, B = _final_ab_core(
            curve, a, b, power_of_y[0], G[0], H[0], g, h,
            r_m, s_m, delta_m, eta_m)
        state = _absorb_points(
            curve, state, b"AB  ", jnp.stack([A, B], axis=-3))
        state, ef_m = _challenge_mont(fn, state, b"ef  ", logn + 3)
        r_p, s_p, d_p = _final_scalars_core(
            curve, a, b, alpha, r_m, s_m, delta_m, eta_m, ef_m)
        L_vec = (jnp.stack(Ls) if Ls
                 else jnp.zeros((0, *A.shape), jnp.int32))
        R_vec = (jnp.stack(Rs) if Rs
                 else jnp.zeros((0, *A.shape), jnp.int32))
        return L_vec, R_vec, A, B, r_p, s_p, d_p, state

    return f


def fs256_replay(curve, m: int, V, A, L_vec, R_vec, Aw, B):
    """In-graph Fiat-Shamir REPLAY for the verifier: derive (y, z, es, ef)
    from the statement and proof tensors exactly as the host twin
    (transcript.py::Fs256Transcript) would — so sound single/batch
    verification needs NO host-side point decode or hashing at all
    (restores the verifier half of what the reference stripped,
    weighted_inner_product_proof.rs:339-348, as ONE device dispatch).

    V: (..., m, C, L); A/Aw/B: (..., C, L); L_vec/R_vec: (..., logn, C, L),
    leading axes batched NATIVELY — the SHA chain's sequential step count is
    independent of the batch size (a vmapped per-proof replay re-traced the
    chain per proof and scaled ~linearly in K). Returns Montgomery-form
    (y (..., L), z, es (..., logn, L), ef). Challenges of value 0 map to 1,
    mirroring the host twin (so the host replay's zero-challenge rejection
    can never disagree)."""
    import hashlib

    from ..transcript import FS256_LABEL

    fn = curve.fn
    logn = L_vec.shape[-3]
    lead = A.shape[:-2]
    state0 = np.frombuffer(
        hashlib.sha256(FS256_LABEL + m.to_bytes(4, "big")).digest(),
        dtype=">u4").astype(np.uint32)

    # ONE batched affine conversion (one Fermat inversion pass) for every
    # absorbed point, then static slices per absorb call
    pts = jnp.concatenate(
        [V, A[..., None, :, :], L_vec, R_vec,
         Aw[..., None, :, :], B[..., None, :, :]], axis=-3)
    coords = _affine_words(curve, pts)          # (..., k·2·nw)
    k = m + 3 + 2 * logn
    cw = coords.reshape(*lead, k, coords.shape[-1] // k)

    def absorb(state, tag4, rows):
        flat = rows.reshape(*lead, -1)
        tw = jnp.broadcast_to(jnp.asarray(tag_words(tag4)), (*lead, 1))
        msg = jnp.concatenate([state, tw, flat], axis=-1)
        return sha256_words(msg, 4 * msg.shape[-1])

    state = jnp.broadcast_to(jnp.asarray(state0), (*lead, 8))
    state = absorb(state, b"stmt", cw[..., : m + 1, :])
    state, y = _challenge_mont(fn, state, b"y   ", 1)
    state, z = _challenge_mont(fn, state, b"z   ", 2)
    es = []
    for r in range(logn):
        lr = jnp.stack(
            [cw[..., m + 1 + r, :], cw[..., m + 1 + logn + r, :]], axis=-2)
        state = absorb(state, b"LR  ", lr)
        state, e = _challenge_mont(fn, state, b"e   ", r + 3)
        es.append(e)
    state = absorb(state, b"AB  ", cw[..., -2:, :])
    state, ef = _challenge_mont(fn, state, b"ef  ", logn + 3)
    es_m = (jnp.stack(es, axis=-2) if es
            else jnp.zeros((*lead, 0, fn.L), y.dtype))
    return y, z, es_m, ef


@functools.lru_cache(maxsize=None)
def wip_prove_fs256_jit(curve, n: int):
    return jax.jit(_wip_prove_fs256_prog(curve, n))


def _wip_prove_fs256_kbatched_prog(curve, n: int, K: int):
    """K sound proofs' fold loops as ONE BATCHED-NATIVE program with
    in-graph fs256 challenges — the sound twin of
    wip._wip_prove_known_kbatched_prog (same flat-grid Pallas dispatch
    shape; see its docstring for why vmap instances lose), with the
    transcript chain advanced on the (K, 8) states between rounds. The only
    extra sequential work per round vs the known-challenge program is one
    batched Fermat inversion of the round challenge (e_inv for the fold)
    plus ~6 SHA-256 compressions."""
    from .wip import _joint_rows_msm

    fn = curve.fn
    logn = n.bit_length() - 1
    nbits = fn.order_bits
    hs = [n >> (r + 1) for r in range(logn)]
    from ..curves.pallas_curve import joint_ladder_msm_grouped

    def f(a, b, power_of_y, alpha, G, H, g, h, states,
          dLs_m, dRs_m, r_m, s_m, delta_m, eta_m):
        ynhats = power_of_y[:, np.array([h_ - 1 for h_ in hs])]  # (K,logn,L)
        _, ynhat_invs = fn.batch_invert(ynhats, axis=1)

        Gk = jnp.broadcast_to(G, (K, *G.shape))
        Hk = jnp.broadcast_to(H, (K, *H.shape))
        gk = jnp.broadcast_to(g, (K, *g.shape))
        hk = jnp.broadcast_to(h, (K, *h.shape))
        state = states

        Ls, Rs = [], []
        for r in range(logn):
            half = hs[r]
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
            ], axis=1)
            LR = _joint_rows_msm(curve, fn.from_mont(S), P, nbits)
            Ls.append(LR[:, 0])
            Rs.append(LR[:, 1])

            # in-graph transcript: absorb (L, R), squeeze round challenge
            state = _absorb_points(curve, state, b"LR  ", LR)
            state, e_m = _challenge_mont(fn, state, b"e   ", r + 3)
            e_inv = fn.inv(e_m)
            e_sqr = fn.mul(e_m, e_m)
            e_sqr_inv = fn.mul(e_inv, e_inv)

            # folds (identical to the known-challenge kbatched program)
            a = fn.add(fn.mul(a1, e_m[:, None]),
                       fn.mul(a2, fn.mul(ynhat, e_inv)[:, None]))
            b = fn.add(fn.mul(b1, e_inv[:, None]), fn.mul(b2, e_m[:, None]))
            fold4 = fn.from_mont(jnp.stack(
                [e_inv, fn.mul(ynhat_inv, e_m), e_m, e_inv], axis=1))
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
                fn.mul(e_sqr, dL), fn.mul(e_sqr_inv, dR)))

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
        ], axis=1)
        AB_p = jnp.stack([
            jnp.stack([Gk[:, 0], Hk[:, 0], gk, hk], axis=1),
            jnp.stack([gk, hk,
                       jnp.broadcast_to(ident, gk.shape),
                       jnp.broadcast_to(ident, gk.shape)], axis=1),
        ], axis=1)
        AB = _joint_rows_msm(curve, fn.from_mont(AB_s), AB_p, nbits)
        A, B = AB[:, 0], AB[:, 1]

        state = _absorb_points(
            curve, state, b"AB  ", jnp.stack([A, B], axis=-3))
        state, ef_m = _challenge_mont(fn, state, b"ef  ", logn + 3)
        r_prime = fn.add(r_m, fn.mul(a0, ef_m))
        s_prime = fn.add(s_m, fn.mul(b0, ef_m))
        d_prime = fn.add(eta_m, fn.add(
            fn.mul(delta_m, ef_m), fn.mul(alpha, fn.mul(ef_m, ef_m))))
        L_vec = jnp.stack(Ls, axis=1) if Ls else jnp.zeros(
            (K, 0, *A.shape[-2:]), jnp.int32)
        R_vec = jnp.stack(Rs, axis=1) if Rs else jnp.zeros(
            (K, 0, *A.shape[-2:]), jnp.int32)
        return L_vec, R_vec, A, B, r_prime, s_prime, d_prime, state

    return f


@functools.lru_cache(maxsize=None)
def wip_prove_fs256_kbatched_jit(curve, n: int, K: int):
    return jax.jit(_wip_prove_fs256_kbatched_prog(curve, n, K))


@functools.lru_cache(maxsize=None)
def wip_prove_fs256_vmap_jit(curve, n: int):
    """K sound proofs in one program: generators broadcast, transcript
    states and blinds carry the K axis — in-graph challenges make the
    BATCH sound prover a single dispatch too (vs 2·log2(mn) host trips)."""
    return jax.jit(jax.vmap(
        _wip_prove_fs256_prog(curve, n),
        in_axes=(0, 0, 0, 0, None, None, None, None, 0,
                 0, 0, 0, 0, 0, 0),
    ))
