"""Sequence-parallel prover: the WIP fold loop with the mn axis SHARDED.

SURVEY.md §5 ("long-context / sequence parallelism"): the domain's sequence
axis is the vector length mn — the reference prover folds it in log2(mn)
sequential rounds (weighted_inner_product_proof.rs:79-172), each round
reading both halves of every vector. The TPU-native mapping:

  CYCLIC layout. Element i of every length-n vector (a, b, y-powers, G, H)
  lives on device i mod P, local slot i div P — i.e. the (n,) array is
  viewed as (n/P, P) and the second axis is sharded. Because n and P are
  powers of two, the round's halves satisfy (i + n/2) mod P == i mod P
  whenever n/2 >= P: a1[i] and a2[i] are CO-RESIDENT on every device, so
  the fold a' = e·a1 + ŷe⁻¹·a2 (and the G/H generator folds, the heavy
  per-round work) is embarrassingly parallel with ZERO communication —
  the round "reshard" the reference's memory layout would force simply
  never happens. Per round the only collectives are:

    - one all_gather of the two c_L/c_R field partials (psum-shaped, but
      gathered and summed through the field's own carry-correct adds —
      raw integer psum would bypass lazy-reduction bound tracking);
    - one all_gather of each device's (L, R) partial points, combined by
      a log2(P) tree of point adds (points cannot psum: group addition
      is not elementwise integer addition).

  The g/h tail lanes of L and R (c_L·g + d_L·h, wip:98-125) are weighted
  by P⁻¹ mod p on every device, so their sum over the mesh restores
  exactly c_L·g + d_L·h without a device-0 branch.

  Once the folded length drops below P the remaining state (< 2P
  elements) is gathered and the tail rounds + final A/B run REPLICATED on
  every device — identical tiny work, no further communication.

Soundness: with the fs256 transcript the Fiat-Shamir state rides inside
the same program — every device advances an identical replicated SHA-256
state over the combined (L, R) points (protocol/fs256.py), so the SHARDED
prover is sound in one dispatch, with challenges that provably depend on
the proof points. With a DeterministicTranscript the reference's replay
constants are fed in ahead (bit-exact differential mode).

This module is the prover-side "tensor/sequence parallel" counterpart of
parallel/sharded_msm.py (the verifier side), completing SURVEY.md §5's
parallelism inventory.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..msm.engine import _next_pow2, _scalar_mul_jit
from .mesh import synced_call


def _tree0(curve, pts):
    """Σ over axis 0 (power-of-two length) by halving point adds."""
    n = pts.shape[0]
    while n > 1:
        pts = curve.add(pts[: n // 2], pts[n // 2:])
        n //= 2
    return pts[0]


def _n_sharded_rounds(n: int, ndev: int) -> int:
    """Rounds whose fold stays local under cyclic layout: half >= ndev."""
    cnt, half = 0, n // 2
    while half >= ndev:
        cnt += 1
        half //= 2
    return cnt


@functools.lru_cache(maxsize=None)
def _sharded_fold_jit(curve, n: int, mesh: Mesh, axis: str, fs256: bool):
    """One compiled program: the whole fold loop + finals over the mesh.

    Inputs mirror wip._wip_prove_known_unrolled_prog, with the length-n
    arrays pre-viewed as (n/P, P, ...) cyclic blocks; `ef_or_state` is the
    final challenge (known mode) or the (8,) uint32 fs256 transcript state
    after y/z (fs256 mode). Outputs carry a leading device axis (every
    device's copy is identical after the combines); callers slice [0]."""
    fn = curve.fn
    nbits = fn.order_bits
    ndev = mesh.shape[axis]
    logn = n.bit_length() - 1
    n_shard = _n_sharded_rounds(n, ndev)
    sm = _scalar_mul_jit(curve, nbits)
    ident_np = curve.identity_np
    invP_np = None
    if n_shard:
        import numpy as _np

        invP_np = _np.asarray(fn.encode(pow(ndev, -1, fn.p)))

    if fs256:
        from ..protocol.fs256 import _absorb_points, _challenge_mont

    def _lr_pair(a1, a2, b1, b2, G1, G2, H1, H2, g, h, ynhat, ynhat_inv,
                 c_L, c_R, dL, dR):
        """The two-row L/R MSM (wip:98-125) at the caller's lane width;
        returns the (2, W', C, L) ladder products (not yet reduced)."""
        sL = jnp.concatenate([fn.mul(a1, ynhat_inv), b2,
                              c_L[None], dL[None]])
        sR = jnp.concatenate([fn.mul(a2, ynhat), b1, c_R[None], dR[None]])
        S2 = jnp.stack([sL, sR])
        P2 = jnp.stack([
            jnp.concatenate([G2, H1, g[None], h[None]]),
            jnp.concatenate([G1, H2, g[None], h[None]]),
        ])
        W = S2.shape[1]
        Wp = _next_pow2(W)
        if Wp != W:
            S2 = jnp.concatenate(
                [S2, jnp.zeros((2, Wp - W, fn.L), jnp.int32)], axis=1)
            P2 = jnp.concatenate(
                [P2, jnp.broadcast_to(jnp.asarray(ident_np),
                                      (2, Wp - W, *P2.shape[-2:]))], axis=1)
        prods = sm(fn.from_mont(S2), P2)       # (2, Wp, C, L)
        m = prods.shape[1]
        while m > 1:
            prods = curve.add(prods[:, : m // 2], prods[:, m // 2:])
            m //= 2
        return prods[:, 0]                     # (2, C, L)

    def body(a_c, b_c, y_c, G_c, H_c, g, h, alpha, es_m, dLs_m, dRs_m,
             r_m, s_m, delta_m, eta_m, ef_or_state, ynhats, ynhat_invs):
        # blocks: (S, 1, ...) — this device's cyclic slice
        al, bl, yl = a_c[:, 0], b_c[:, 0], y_c[:, 0]
        Gl, Hl = G_c[:, 0], H_c[:, 0]
        state = ef_or_state if fs256 else None
        Ls, Rs = [], []

        # ---- phase 1: sharded rounds (half >= ndev) ----
        for r in range(n_shard):
            half = n >> (r + 1)
            hS = half // ndev
            a1, a2 = al[:hS], al[hS:]
            b1, b2 = bl[:hS], bl[hS:]
            G1, G2 = Gl[:hS], Gl[hS:]
            H1, H2 = Hl[:hS], Hl[hS:]
            y1 = yl[:hS]
            ynhat, ynhat_inv = ynhats[r], ynhat_invs[r]

            cL_p = fn.sum(fn.mul(fn.mul(a1, b2), y1))
            cR_p = fn.sum(fn.mul(fn.mul(a2, b1), fn.mul(y1, ynhat)))
            cparts = lax.all_gather(jnp.stack([cL_p, cR_p]), axis)
            c_L = fn.sum(cparts[:, 0])
            c_R = fn.sum(cparts[:, 1])

            invP = jnp.asarray(invP_np)
            part = _lr_pair(a1, a2, b1, b2, G1, G2, H1, H2, g, h,
                            ynhat, ynhat_inv,
                            fn.mul(c_L, invP), fn.mul(c_R, invP),
                            fn.mul(dLs_m[r], invP), fn.mul(dRs_m[r], invP))
            parts = lax.all_gather(part, axis)  # (ndev, 2, C, L)
            LR = _tree0(curve, parts)
            Ls.append(LR[0])
            Rs.append(LR[1])

            if fs256:
                state = _absorb_points(curve, state, b"LR  ", LR)
                state, e_m = _challenge_mont(fn, state, b"e   ", r + 3)
            else:
                e_m = es_m[r]
            e_inv = fn.inv(e_m)

            al = fn.add(fn.mul(a1, e_m), fn.mul(a2, fn.mul(ynhat, e_inv)))
            bl = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
            fold4 = fn.from_mont(jnp.stack(
                [e_inv, fn.mul(ynhat_inv, e_m), e_m, e_inv]))
            fg = sm(jnp.broadcast_to(fold4[:, None], (4, hS, fn.L)),
                    jnp.stack([G1, G2, H1, H2]))
            Gl = curve.add(fg[0], fg[1])
            Hl = curve.add(fg[2], fg[3])
            yl = y1
            alpha = fn.add(alpha, fn.add(
                fn.mul(fn.mul(e_m, e_m), dLs_m[r]),
                fn.mul(fn.mul(e_inv, e_inv), dRs_m[r])))

        # ---- phase 2: gather the short state, go replicated ----
        def degather(x):
            # (ndev, S', ...) all-gathered cyclic slices → global order
            g_ = lax.all_gather(x, axis)
            return jnp.moveaxis(g_, 0, 1).reshape(-1, *x.shape[1:])

        al, bl, yl = degather(al), degather(bl), degather(yl)
        Gl, Hl = degather(Gl), degather(Hl)
        size = n >> n_shard

        # ---- phase 3: replicated tail rounds ----
        for r in range(n_shard, logn):
            half = size // 2
            a1, a2 = al[:half], al[half:]
            b1, b2 = bl[:half], bl[half:]
            G1, G2 = Gl[:half], Gl[half:]
            H1, H2 = Hl[:half], Hl[half:]
            y1 = yl[:half]
            ynhat, ynhat_inv = ynhats[r], ynhat_invs[r]

            c_L = fn.sum(fn.mul(fn.mul(a1, b2), y1))
            c_R = fn.sum(fn.mul(fn.mul(a2, b1), fn.mul(y1, ynhat)))
            LR = _lr_pair(a1, a2, b1, b2, G1, G2, H1, H2, g, h,
                          ynhat, ynhat_inv, c_L, c_R, dLs_m[r], dRs_m[r])
            Ls.append(LR[0])
            Rs.append(LR[1])

            if fs256:
                state = _absorb_points(curve, state, b"LR  ", LR)
                state, e_m = _challenge_mont(fn, state, b"e   ", r + 3)
            else:
                e_m = es_m[r]
            e_inv = fn.inv(e_m)

            al = fn.add(fn.mul(a1, e_m), fn.mul(a2, fn.mul(ynhat, e_inv)))
            bl = fn.add(fn.mul(b1, e_inv), fn.mul(b2, e_m))
            fold4 = fn.from_mont(jnp.stack(
                [e_inv, fn.mul(ynhat_inv, e_m), e_m, e_inv]))
            fg = sm(jnp.broadcast_to(fold4[:, None], (4, half, fn.L)),
                    jnp.stack([G1, G2, H1, H2]))
            Gl = curve.add(fg[0], fg[1])
            Hl = curve.add(fg[2], fg[3])
            yl = y1
            alpha = fn.add(alpha, fn.add(
                fn.mul(fn.mul(e_m, e_m), dLs_m[r]),
                fn.mul(fn.mul(e_inv, e_inv), dRs_m[r])))
            size = half

        # ---- finals (wip:181-216) ----
        from ..protocol.wip import _final_ab_core, _final_scalars_core

        A, B = _final_ab_core(curve, al, bl, yl[0], Gl[0], Hl[0], g, h,
                              r_m, s_m, delta_m, eta_m)
        if fs256:
            state = _absorb_points(
                curve, state, b"AB  ", jnp.stack([A, B], axis=-3))
            state, ef_m = _challenge_mont(fn, state, b"ef  ", logn + 3)
        else:
            ef_m = ef_or_state
        r_p, s_p, d_p = _final_scalars_core(
            curve, al, bl, alpha, r_m, s_m, delta_m, eta_m, ef_m)

        L_vec = (jnp.stack(Ls) if Ls
                 else jnp.zeros((0, *A.shape), jnp.int32))
        R_vec = (jnp.stack(Rs) if Rs
                 else jnp.zeros((0, *A.shape), jnp.int32))
        outs = (L_vec, R_vec, A, B, r_p, s_p, d_p)
        if fs256:
            outs = outs + (state,)
        return tuple(o[None] for o in outs)

    shard = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(None, axis, None), P(None, axis, None),      # a, b
            P(None, axis, None),                           # y
            P(None, axis, None, None), P(None, axis, None, None),  # G, H
            P(None, None), P(None, None),                  # g, h
            P(None),                                       # alpha
            P(None, None), P(None, None), P(None, None),   # es, dLs, dRs
            P(None), P(None), P(None), P(None),            # r s delta eta
            P(None),                                       # ef / state
            P(None, None), P(None, None),                  # ynhats, invs
        ),
        out_specs=tuple(
            P(axis, *([None] * nd))
            for nd in ([3, 3, 2, 2, 1, 1, 1] + ([1] if fs256 else []))
        ),
        check_vma=False,
    )

    def f(a, b, y_pow, alpha, G, H, g, h, es_m, dLs_m, dRs_m,
          r_m, s_m, delta_m, eta_m, ef_or_state):
        S0 = n // ndev
        a_c = a.reshape(S0, ndev, fn.L)
        b_c = b.reshape(S0, ndev, fn.L)
        y_c = y_pow.reshape(S0, ndev, fn.L)
        G_c = G.reshape(S0, ndev, *G.shape[-2:])
        H_c = H.reshape(S0, ndev, *H.shape[-2:])
        halves = np.array([(n >> (r + 1)) - 1 for r in range(logn)])
        ynhats = y_pow[halves]                       # y^(half) each round
        _, ynhat_invs = fn.batch_invert(ynhats)
        outs = shard(a_c, b_c, y_c, G_c, H_c, g, h, alpha,
                     es_m, dLs_m, dRs_m, r_m, s_m, delta_m, eta_m,
                     ef_or_state, ynhats, ynhat_invs)
        return tuple(o[0] for o in outs)

    return jax.jit(f)


def sharded_prove(curve, pk, n: int, prover, mesh: Mesh, transcript=None,
                  rng=None, axis: str = "tp"):
    """Prove one range statement with the mn axis sharded over mesh[axis].

    transcript: Fs256Transcript (default — sound, challenges derived
    in-graph from replicated state) or DeterministicTranscript (reference
    replay; bit-exact vs prove()). rng: SystemRng default. Requires mn and
    the mesh axis size to be powers of two with mn >= ndev.

    Returns a RangeProof identical to prove() under the same
    (transcript, rng) — verified byte-for-byte in
    tests/test_sharded_prover.py.
    """
    from ..protocol.range import (
        RangeProof,
        _bit_commitment,
        _bit_decompose,
        _prove_setup_multiple_jit,
        _prove_setup_single_jit,
        _validate,
        pk_prefix,
    )
    from ..protocol.wip import WipProof
    from ..transcript import Fs256Transcript, SystemRng

    fn = curve.fn
    m = len(prover.v_vec)
    _validate(pk, n, m)
    mn = n * m
    ndev = mesh.shape[axis]
    if mn < ndev or mn & (mn - 1) or ndev & (ndev - 1):
        raise ValueError("mn and mesh axis must be powers of two, mn >= P")
    pk = pk_prefix(pk, mn)
    transcript = transcript or Fs256Transcript(m)
    rng = rng or SystemRng(fn.p)
    fs256 = bool(getattr(transcript, "device_graph", False))
    known = getattr(transcript, "challenges_known_ahead", False)
    if not (fs256 or known):
        raise ValueError(
            "sharded_prove needs an fs256 or known-challenge transcript "
            "(interactive host-hash transcripts serialize the mesh)")
    if fs256 and getattr(transcript, "_counter", 0) != 0:
        # mirror wip_prove's guard (wip.py known-path): the device program
        # hashes absolute challenge counters 3..logn+3 assuming the state
        # handed over is exactly post-(y, z) (counter == 2 after
        # challenge_yz below). A reused/pre-advanced transcript would
        # silently desynchronize host challenge numbering and emit an
        # unverifiable proof.
        raise ValueError("fs256 sharded_prove needs a FRESH transcript")

    logn = mn.bit_length() - 1
    alpha = rng.alpha()
    v_bits = _bit_decompose(prover.v_vec, n, m)
    A = _bit_commitment(curve, pk, alpha, v_bits, mn)
    y, z = transcript.challenge_yz(curve, list(prover.commitment_vec), A)

    if m == 1:
        setup = _prove_setup_single_jit(curve, n)
        gamma_arg = jnp.asarray(fn.encode(prover.gamma_vec[0]))
        V_arg = prover.commitment_vec[0]
    else:
        setup = _prove_setup_multiple_jit(curve, n, m)
        gamma_arg = jnp.asarray(fn.encode(list(prover.gamma_vec)))
        V_arg = jnp.stack(list(prover.commitment_vec))
    a_vec, b_vec, power_of_y, alpha_hat = setup(
        jnp.asarray(fn.encode(y % fn.p)), jnp.asarray(fn.encode(z % fn.p)),
        jnp.asarray(v_bits).reshape(mn), gamma_arg,
        jnp.asarray(fn.encode(alpha)), A, V_arg,
        pk.G_vec, pk.H_vec, pk.g,
    )

    dLs, dRs = zip(*[rng.round_blinds() for _ in range(logn)]) \
        if logn else ((), ())
    r_, s_, delta, eta = rng.final_blinds()
    enc = lambda v: jnp.asarray(fn.encode(v))  # noqa: E731
    if known:
        es = [transcript.round_challenge(curve, None, None) % fn.p
              for _ in range(logn)]
        ef = transcript.final_challenge(curve, None, None) % fn.p
        tail = enc(ef)
        es_m = enc(list(es)) if logn else jnp.zeros((0, fn.L), jnp.int32)
    else:
        tail = jnp.asarray(transcript.state_words())
        es_m = jnp.zeros((max(logn, 1), fn.L), jnp.int32)[:logn]

    prog = _sharded_fold_jit(curve, mn, mesh, axis, fs256)
    args = [a_vec, b_vec, power_of_y, alpha_hat,
            pk.G_vec, pk.H_vec, pk.g, pk.h,
            es_m, enc(list(dLs)) if logn else jnp.zeros((0, fn.L), jnp.int32),
            enc(list(dRs)) if logn else jnp.zeros((0, fn.L), jnp.int32),
            enc(r_), enc(s_), enc(delta), enc(eta), tail]
    outs = synced_call(prog, *args)
    if fs256:
        (L_vec, R_vec, Aw, B, r_p, s_p, d_p, state) = outs
        transcript.set_state_words(np.asarray(state), logn + 1)
    else:
        (L_vec, R_vec, Aw, B, r_p, s_p, d_p) = outs
    return RangeProof(A=A, proof=WipProof(
        L_vec=L_vec, R_vec=R_vec, A=Aw, B=B,
        r_prime=r_p, s_prime=s_p, d_prime=d_p,
    ))
