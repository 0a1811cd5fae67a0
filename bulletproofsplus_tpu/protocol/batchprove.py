"""Batch proving: K range proofs over one pk in a handful of device programs.

The reference proves one statement at a time (range/mod.rs:31-55); its prover
is a sequential fold loop. On TPU the natural serving shape is a HOMOGENEOUS
batch (same n, same m): every per-proof tensor gains a leading K axis and the
three prover programs (bit commitment, setup, whole-fold scan — see range.py
and wip._wip_prove_known_scan_prog) run once each under jax.vmap, so the
prover's device-dispatch count is independent of K.

Two transcript regimes:
- known-ahead challenges (DeterministicTranscript replay): THREE dispatches
  total for the whole batch;
- interactive Fiat-Shamir (ShaTranscript): the K transcripts hash in
  lockstep — per round ONE fused vmapped program (previous round's fold +
  this round's L/R), ONE device→host fetch of all K proofs' (L, R), K host
  hashes — i.e. log2(mn)+1 dispatches for the whole batch instead of
  2·log2(mn) per proof (BPP_FUSE_ROUNDS=0 splits fold and L/R again).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..transcript import Fs256Transcript, SystemRng
from .range import (
    ProofBatch,
    _bit_commitment_batch_prog,
    _bit_decompose,
    _prove_setup_multiple_prog,
    _prove_setup_single_prog,
    _validate,
)
from .wip import (
    _final_ab_core,
    _final_scalars_core,
    _fuse_rounds_ok,
    _round_fold_core,
    _round_fold_final_core,
    _round_fold_lr_core,
    _round_lr_core,
    _fold_pad,
    _wip_prove_known_scan_vmap_jit,
)


@functools.lru_cache(maxsize=None)
def _bit_commitment_vmap_jit(curve, mn: int):
    # natively batched (leading K axis), NOT vmapped: lets tree_sum use the
    # grouped Pallas sum kernel on TPU (see _bit_commitment_batch_prog)
    return jax.jit(_bit_commitment_batch_prog(curve))


@functools.lru_cache(maxsize=None)
def _setup_multiple_vmap_jit(curve, n: int, m: int):
    return jax.jit(jax.vmap(
        _prove_setup_multiple_prog(curve, n, m),
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None),
    ))


@functools.lru_cache(maxsize=None)
def _setup_single_vmap_jit(curve, n: int):
    return jax.jit(jax.vmap(
        _prove_setup_single_prog(curve, n),
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None),
    ))


@functools.lru_cache(maxsize=None)
def _round_lr_vmap_jit(curve, n: int):
    return jax.jit(jax.vmap(
        functools.partial(_round_lr_core, curve),
        in_axes=(0, 0, 0, 0, 0, None, None, 0, 0),
    ))


@functools.lru_cache(maxsize=None)
def _round_fold_vmap_jit(curve, n: int, fold_pad: int):
    return jax.jit(jax.vmap(
        functools.partial(_round_fold_core, curve, fold_pad),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    ))


@functools.lru_cache(maxsize=None)
def _round_fold_lr_vmap_jit(curve, n: int, fold_pad: int):
    return jax.jit(jax.vmap(
        functools.partial(_round_fold_lr_core, curve, fold_pad),
        in_axes=(0, 0, 0, 0, 0, None, None, 0, 0, 0, 0, 0, 0, 0, 0),
    ))


@functools.lru_cache(maxsize=None)
def _round_fold_final_vmap_jit(curve, n: int, fold_pad: int):
    return jax.jit(jax.vmap(
        functools.partial(_round_fold_final_core, curve, fold_pad),
        in_axes=(0, 0, 0, 0, 0, None, None, 0, 0, 0, 0, 0, 0,
                 0, 0, 0, 0),
    ))


@functools.lru_cache(maxsize=None)
def _final_ab_vmap_jit(curve):
    return jax.jit(jax.vmap(
        functools.partial(_final_ab_core, curve),
        in_axes=(0, 0, 0, 0, 0, None, None, 0, 0, 0, 0),
    ))


@functools.lru_cache(maxsize=None)
def _final_scalars_vmap_jit(curve):
    return jax.jit(jax.vmap(
        functools.partial(_final_scalars_core, curve),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0),
    ))


def batch_prove(
    curve,
    pk,
    n: int,
    provers: Sequence,
    transcripts: Optional[Sequence] = None,
    rngs: Optional[Sequence] = None,
):
    """Prove K range statements (each a RangeProver over the shared pk) in
    one vmapped pipeline. Requires a homogeneous batch (same m for every
    prover); heterogeneous batches fall back to sequential prove() and
    return a list of RangeProof.

    Returns a ProofBatch (pre-stacked arrays — feed it straight to
    batch_verify with zero re-stacking; index it for individual
    RangeProofs, identical to what prove() produces for the same
    (transcript, rng))."""
    from .range import prove as _prove_one

    fn = curve.fn
    K = len(provers)
    if K == 0:
        return []
    m = len(provers[0].v_vec)
    if any(len(p.v_vec) != m for p in provers):
        return [
            _prove_one(curve, pk, n, p,
                       transcript=(transcripts[i] if transcripts else None),
                       rng=(rngs[i] if rngs else None))
            for i, p in enumerate(provers)
        ]
    _validate(pk, n, m)
    from .range import pk_prefix

    pk = pk_prefix(pk, n * m)
    # secure by default (matching prove()): real Fiat-Shamir + random blinds;
    # the reference-constant mode is opt-in via explicit transcripts/rngs
    transcripts = (list(transcripts) if transcripts
                   else [Fs256Transcript(m) for _ in range(K)])
    rngs = list(rngs) if rngs else [SystemRng(curve.fn.p) for _ in range(K)]

    # CPU gate: the vmapped prover programs (a point-ladder MSM per fold
    # round) exhaust LLVM compile memory on XLA:CPU (observed >100 GB →
    # "LLVM compilation error: Cannot allocate memory"); TPU compiles them
    # fine. Fall back to K sequential eager proves — identical proof bytes,
    # same ProofBatch container. BPP_BATCH_VMAP=1 forces the vmapped
    # pipeline anyway (debug/parity runs that can afford the compile).
    if (jax.default_backend() == "cpu"
            and os.environ.get("BPP_BATCH_VMAP") != "1"):
        return ProofBatch.from_proofs([
            _prove_one(curve, pk, n, p,
                       transcript=transcripts[i], rng=rngs[i])
            for i, p in enumerate(provers)
        ])

    # Chunk the vmapped K axis: one program instance per K also means one
    # compile per K, and very large K crashes the TPU worker (kernel fault
    # observed at K=64, n=64, m=16 — the whole-fold scan's working set).
    # Chunks of a fixed known-good size reuse ONE compiled program and
    # bound device memory; results concatenate into a single ProofBatch.
    # The INTERACTIVE (hash-transcript) pipeline chunks larger: its
    # per-round programs have a much smaller working set than the whole-
    # fold program, and each chunk costs 2·log2(mn) host round-trips —
    # fewer, larger chunks amortize the ~29 ms dispatch floor.
    # one-dispatch whole-fold programs (known-challenge replay, or fs256
    # in-graph challenges — blinds are challenge-independent and drawn
    # ahead for any rng) chunk small; only the host-hash interactive path
    # amortizes its per-round round-trips with larger chunks.
    whole_fold = os.environ.get("BPP_FUSE_PROVER") != "0" and (
        (all(getattr(t, "challenges_known_ahead", False)
             for t in transcripts)
         and all(getattr(r, "blinds_known_ahead", False) for r in rngs))
        or all(getattr(t, "device_graph", False) for t in transcripts))
    interactive = not whole_fold
    if interactive:
        chunk = int(os.environ.get("BPP_BATCH_PROVE_CHUNK_INTERACTIVE", "64"))
    else:
        chunk = int(os.environ.get("BPP_BATCH_PROVE_CHUNK", "16"))
    if K > chunk:
        parts = [
            batch_prove(curve, pk, n, provers[i:i + chunk],
                        transcripts=transcripts[i:i + chunk],
                        rngs=rngs[i:i + chunk])
            for i in range(0, K, chunk)
        ]
        return ProofBatch(**{
            f.name: jnp.concatenate([getattr(p, f.name) for p in parts])
            for f in dataclasses.fields(ProofBatch)
        })

    mn = n * m
    logn = mn.bit_length() - 1

    alphas = [r.alpha() for r in rngs]
    bits_np = np.stack([_bit_decompose(p.v_vec, n, m) for p in provers])
    A_all = _bit_commitment_vmap_jit(curve, mn)(
        jnp.asarray(fn.encode_plain(alphas)),
        jnp.asarray(bits_np),
        pk.G_vec, pk.H_vec, pk.h,
    )  # (K, C, L)

    known_t = all(getattr(t, "challenges_known_ahead", False)
                  for t in transcripts)
    if known_t:
        yz = [t.challenge_yz(curve, None, None) for t in transcripts]
    else:
        # batched decode of A and all K·m commitments (one inversion pass)
        A_aff0 = curve.decode_points(np.asarray(A_all))
        V_flat = curve.decode_points(np.asarray(jnp.stack(
            [jnp.stack(list(p.commitment_vec)) for p in provers]
        ).reshape(K * m, -1, fn.L)))
        yz = [
            t.challenge_yz(curve, V_flat[i * m:(i + 1) * m], A_aff0[i])
            for i, t in enumerate(transcripts)
        ]
    ys = [y % fn.p for y, _ in yz]
    zs = [z % fn.p for _, z in yz]

    V_all = jnp.stack(
        [jnp.stack(list(p.commitment_vec)) for p in provers]
    )  # (K, m, C, L)

    if m == 1:
        setup = _setup_single_vmap_jit(curve, n)
        gamma_arg = jnp.asarray(fn.encode([p.gamma_vec[0] for p in provers]))
        V_arg = V_all[:, 0]
    else:
        setup = _setup_multiple_vmap_jit(curve, n, m)
        gamma_arg = jnp.asarray(
            fn.encode([g for p in provers for g in p.gamma_vec])
        ).reshape(K, m, fn.L)
        V_arg = V_all

    a_vec, b_vec, power_of_y, alpha_hat = setup(
        jnp.asarray(fn.encode(ys)),
        jnp.asarray(fn.encode(zs)),
        jnp.asarray(bits_np).reshape(K, mn),
        gamma_arg,
        jnp.asarray(fn.encode(alphas)),
        A_all, V_arg, pk.G_vec, pk.H_vec, pk.g,
    )

    # BPP_FUSE_PROVER=0 forces the per-round path even with known-ahead
    # challenges (same bytes; the whole-fold scan's one-program-per-size
    # compile takes minutes on XLA:CPU — tests/conftest.py)
    known = all(
        getattr(t, "challenges_known_ahead", False) for t in transcripts
    ) and all(
        getattr(r, "blinds_known_ahead", False) for r in rngs
    ) and os.environ.get("BPP_FUSE_PROVER") != "0"

    if known and logn > 0:
        dLs = np.empty((K, logn), dtype=object)
        dRs = np.empty((K, logn), dtype=object)
        es = np.empty((K, logn), dtype=object)
        finals, efs = [], []
        for i, (t, r) in enumerate(zip(transcripts, rngs)):
            for j in range(logn):
                dLs[i, j], dRs[i, j] = r.round_blinds()
                es[i, j] = t.round_challenge(curve, None, None) % fn.p
            finals.append(r.final_blinds())
            efs.append(t.final_challenge(curve, None, None) % fn.p)
        rsde = np.array(finals, dtype=object)  # (K, 4)

        enc2 = lambda arr: jnp.asarray(  # noqa: E731
            fn.encode([int(x) for x in arr.reshape(-1)])
        ).reshape(*arr.shape, fn.L)
        from ..msm.engine import _ladder_ok
        from .wip import (
            _prover_pallas,
            _prover_variant,
            _wip_prove_known_kbatched_jit,
        )

        if (_ladder_ok(curve) and _prover_variant() == "unrolled"
                and _prover_pallas()
                and os.environ.get("BPP_PROVER_KBATCHED", "1") == "1"):
            # batched-NATIVE program: K folded into every kernel's lane
            # axis (one grid per call) instead of K vmap instances with
            # ~4 ms small-grid overhead each — see the prog docstring.
            # DEFAULT ON since round 5: the round-3 bench failure was
            # root-caused to an XLA miscompile of the padded halving tree
            # inside this program (see wip._joint_rows_msm, which now
            # reduces through the grouped-sum kernel) and the program is
            # hardware-validated byte-exact vs the vmapped path with
            # accept+tamper-reject polarity (VALIDATE_KBATCHED_r05.json,
            # scripts/validate_prover_kbatched.py; 2.2x faster at K=16).
            # Gated on _prover_pallas() so BPP_PROVER_PALLAS=0 still
            # forces the XLA comparison baseline.
            fold_prog = _wip_prove_known_kbatched_jit(curve, mn, K)
        else:
            fold_prog = _wip_prove_known_scan_vmap_jit(curve, mn)
        L_vec, R_vec, A, B, r_p, s_p, d_p = fold_prog(
            a_vec, b_vec, power_of_y, alpha_hat,
            pk.G_vec, pk.H_vec, pk.g, pk.h,
            enc2(es), enc2(dLs), enc2(dRs),
            enc2(rsde[:, 0]), enc2(rsde[:, 1]),
            enc2(rsde[:, 2]), enc2(rsde[:, 3]),
            jnp.asarray(fn.encode(efs)),
        )
        return ProofBatch(
            A=A_all, L_vec=L_vec, R_vec=R_vec, A_wip=A, B=B,
            r_prime=r_p, s_prime=s_p, d_prime=d_p,
        )

    if (all(getattr(t, "device_graph", False) for t in transcripts)
            and logn > 0
            and all(getattr(t, "_counter", None) == 2 for t in transcripts)):
        # fs256: in-graph transcripts — the whole sound BATCH fold loop is
        # one vmapped dispatch (protocol/fs256.py)
        from .fs256 import wip_prove_fs256_vmap_jit

        dLs = np.empty((K, logn), dtype=object)
        dRs = np.empty((K, logn), dtype=object)
        finals = []
        for i, r in enumerate(rngs):
            for j in range(logn):
                dLs[i, j], dRs[i, j] = r.round_blinds()
            finals.append(r.final_blinds())
        rsde = np.array(finals, dtype=object)

        enc2 = lambda arr: jnp.asarray(  # noqa: E731
            fn.encode([int(x) for x in arr.reshape(-1)])
        ).reshape(*arr.shape, fn.L)
        states = jnp.asarray(np.stack([t.state_words() for t in transcripts]))
        from ..msm.engine import _ladder_ok
        from .wip import _prover_pallas, _prover_variant

        if (_ladder_ok(curve) and _prover_variant() == "unrolled"
                and _prover_pallas()
                and os.environ.get("BPP_PROVER_KBATCHED", "1") == "1"):
            # batched-NATIVE sound program: flat kernel grids instead of K
            # vmap instances (same gate/default as the known-challenge path)
            from .fs256 import wip_prove_fs256_kbatched_jit

            fs_prog = wip_prove_fs256_kbatched_jit(curve, mn, K)
        else:
            fs_prog = wip_prove_fs256_vmap_jit(curve, mn)
        L_vec, R_vec, A, B, r_p, s_p, d_p, states_out = fs_prog(
            a_vec, b_vec, power_of_y, alpha_hat,
            pk.G_vec, pk.H_vec, pk.g, pk.h, states,
            enc2(dLs), enc2(dRs),
            enc2(rsde[:, 0]), enc2(rsde[:, 1]),
            enc2(rsde[:, 2]), enc2(rsde[:, 3]),
        )
        states_np = np.asarray(states_out)
        for i, t in enumerate(transcripts):
            t.set_state_words(states_np[i], logn + 1)
        return ProofBatch(
            A=A_all, L_vec=L_vec, R_vec=R_vec, A_wip=A, B=B,
            r_prime=r_p, s_prime=s_p, d_prime=d_p,
        )

    # interactive path: K transcripts advance in lockstep; by default each
    # round is ONE fused vmapped program (previous round's fold + this
    # round's L/R — log2(mn)+1 dispatches total); BPP_FUSE_ROUNDS=0
    # restores the separate L/R + fold program pair per round
    fold_pad = _fold_pad(mn)
    a, b, y_pow = a_vec, b_vec, power_of_y
    G = jnp.broadcast_to(pk.G_vec, (K, *pk.G_vec.shape))
    H = jnp.broadcast_to(pk.H_vec, (K, *pk.H_vec.shape))
    alpha = alpha_hat
    L_cols, R_cols = [], []
    size = mn

    def enc_col(vals):
        return jnp.asarray(fn.encode(vals))

    def hash_round(L, R):
        # ONE fetch + ONE batched affine decode for all K (the transcripts
        # hash pre-decoded (x, y) tuples; per-point Fermat pows were the
        # sha-mode hot spot)
        L_aff = curve.decode_points(np.asarray(L))
        R_aff = curve.decode_points(np.asarray(R))
        return enc_col([
            t.round_challenge(curve, L_aff[i], R_aff[i]) % fn.p
            for i, t in enumerate(transcripts)
        ])

    def draw_blinds():
        blinds = [r.round_blinds() for r in rngs]
        return (enc_col([b_[0] for b_ in blinds]),
                enc_col([b_[1] for b_ in blinds]))

    if _fuse_rounds_ok() and size > 1:
        dL_m, dR_m = draw_blinds()
        L, R, y_nhat, y_nhat_inv = _round_lr_vmap_jit(curve, size)(
            a, b, y_pow, G, H, pk.g, pk.h, dL_m, dR_m
        )
        L_cols.append(L)
        R_cols.append(R)
        e_m = hash_round(L, R)
        while size > 2:
            dL2_m, dR2_m = draw_blinds()
            (L, R, a, b, y_pow, G, H, alpha,
             y_nhat, y_nhat_inv) = _round_fold_lr_vmap_jit(
                curve, size, fold_pad
            )(
                a, b, y_pow, G, H, pk.g, pk.h, alpha,
                dL_m, dR_m, e_m, y_nhat, y_nhat_inv, dL2_m, dR2_m,
            )
            L_cols.append(L)
            R_cols.append(R)
            e_m = hash_round(L, R)
            dL_m, dR_m = dL2_m, dR2_m
            size //= 2
        finals = [r.final_blinds() for r in rngs]
        r_m = enc_col([f[0] for f in finals])
        s_m = enc_col([f[1] for f in finals])
        delta_m = enc_col([f[2] for f in finals])
        eta_m = enc_col([f[3] for f in finals])
        A, B, a, b, alpha = _round_fold_final_vmap_jit(
            curve, size, fold_pad
        )(
            a, b, y_pow, G, H, pk.g, pk.h, alpha,
            dL_m, dR_m, e_m, y_nhat, y_nhat_inv,
            r_m, s_m, delta_m, eta_m,
        )
    else:
        while size != 1:
            dL_m, dR_m = draw_blinds()
            L, R, y_nhat, y_nhat_inv = _round_lr_vmap_jit(curve, size)(
                a, b, y_pow, G, H, pk.g, pk.h, dL_m, dR_m
            )
            L_cols.append(L)
            R_cols.append(R)
            es_m = hash_round(L, R)
            a, b, y_pow, G, H, alpha = _round_fold_vmap_jit(
                curve, size, fold_pad
            )(
                a, b, y_pow, G, H, alpha, dL_m, dR_m,
                es_m, y_nhat, y_nhat_inv,
            )
            size //= 2

        finals = [r.final_blinds() for r in rngs]
        r_m = jnp.asarray(fn.encode([f[0] for f in finals]))
        s_m = jnp.asarray(fn.encode([f[1] for f in finals]))
        delta_m = jnp.asarray(fn.encode([f[2] for f in finals]))
        eta_m = jnp.asarray(fn.encode([f[3] for f in finals]))
        A, B = _final_ab_vmap_jit(curve)(
            a, b, y_pow[:, 0], G[:, 0], H[:, 0], pk.g, pk.h,
            r_m, s_m, delta_m, eta_m,
        )
    A_aff = curve.decode_points(np.asarray(A))
    B_aff = curve.decode_points(np.asarray(B))
    efs = [
        t.final_challenge(curve, A_aff[i], B_aff[i]) % fn.p
        for i, t in enumerate(transcripts)
    ]
    r_p, s_p, d_p = _final_scalars_vmap_jit(curve)(
        a, b, alpha, r_m, s_m, delta_m, eta_m,
        jnp.asarray(fn.encode(efs)),
    )
    L_vec = jnp.stack(L_cols, axis=1) if L_cols else jnp.zeros(
        (K, 0, *A.shape[-2:]), jnp.int32)
    R_vec = jnp.stack(R_cols, axis=1) if R_cols else jnp.zeros(
        (K, 0, *A.shape[-2:]), jnp.int32)
    return ProofBatch(
        A=A_all, L_vec=L_vec, R_vec=R_vec, A_wip=A, B=B,
        r_prime=r_p, s_prime=s_p, d_prime=d_p,
    )
