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


@functools.lru_cache(maxsize=None)
def wip_prove_fs256_jit(curve, n: int):
    return jax.jit(_wip_prove_fs256_prog(curve, n))


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
