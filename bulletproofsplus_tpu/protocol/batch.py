"""Batch verification: many proofs → one (sharded) mega-MSM.

The reference verifies proofs one at a time, each as one MSM
(range/mod.rs:479-509). Because each proof's verification is "MSM == identity",
a random linear combination of many proofs' MSMs is still one MSM whose
success implies (with overwhelming probability) every term was the identity.
Since all proofs share the pk generators, their G_vec/H_vec/g/h exponents are
merged by field adds — the combined MSM has 2mn + 2 shared terms plus only
the per-proof unique terms (A, A_wip, B, L_vec, R_vec, V), and shards across
the mesh (BASELINE config 5).
"""
from __future__ import annotations

import secrets
from typing import List, Optional, Sequence

import jax.numpy as jnp

from ..errors import VerificationError
from ..msm import msm
from .range import (
    ProofBatch,
    RangeProof,
    VerificationInputs,
    stack_commitments,
    verification_inputs,
    verification_inputs_batch,
)


def batch_verify(
    curve,
    pk,
    n: int,
    proofs,
    commitment_lists,
    transcripts: Optional[Sequence] = None,
    mesh=None,
    rng=None,
) -> None:
    """Verify many proofs over one pk in a single MSM. Raises on failure.

    proofs: a ProofBatch (the zero-restacking fast path — what batch_prove
    returns) or a sequence of RangeProof. commitment_lists: a (K, m, C, L)
    array or K per-proof commitment lists. transcripts: per-proof transcript
    (default: deterministic, matching the reference's constants). rng:
    optional callable returning random weight ints (for tests); defaults to
    128-bit secrets.
    """
    fn = curve.fn
    n_commits = (commitment_lists.shape[0]
                 if isinstance(commitment_lists, jnp.ndarray)
                 else len(commitment_lists))
    if len(proofs) != n_commits:
        raise VerificationError("proof/commitment count mismatch")
    if len(proofs) == 0:
        return
    transcripts = transcripts or [None] * len(proofs)
    draw = rng or (lambda: secrets.randbits(128))
    K = len(proofs)
    from .range import pk_prefix

    m0 = (commitment_lists.shape[1]
          if isinstance(commitment_lists, jnp.ndarray)
          else len(commitment_lists[0]))
    pk = pk_prefix(pk, n * m0)

    if isinstance(commitment_lists, jnp.ndarray):
        homogeneous = True
    else:
        homogeneous = all(
            len(V) == len(commitment_lists[0]) for V in commitment_lists[1:]
        )
    dp = (mesh.shape.get("dp", 1)
          if mesh is not None and hasattr(mesh, "shape") else 1)
    if homogeneous:
        # ONE vmapped program computes every proof's exponent vectors, and
        # ONE weighted multiply + tree-reduce merges them (the per-proof
        # loop is dispatch-latency-bound on a remote TPU backend)
        inp = verification_inputs_batch(
            curve, proofs, pk, n, commitment_lists, transcripts
        )
        W = jnp.asarray(fn.encode([draw() for _ in range(K)]))  # (K, L)
        Wg = W[:, None, :]
        if dp > 1 and K % dp == 0:
            # DP x TP: fold the K proofs into dp group mega-MSMs instead of
            # one — each group's pairs shard over the tp axis of its own
            # mesh row, all dp rows run concurrently (SURVEY.md §2
            # "data parallelism ≈ batch verification")
            return _batch_verify_dp(curve, pk, inp, W, Wg, K, dp, mesh)
        G_exp = fn.sum(fn.mul(inp.G_exp, Wg), axis=0)
        H_exp = fn.sum(fn.mul(inp.H_exp, Wg), axis=0)
        g_exp = fn.sum(fn.mul(inp.g_exp, W), axis=0)
        h_exp = fn.sum(fn.mul(inp.h_exp, W), axis=0)
        uniq_s = fn.mul(inp.unique_scalars, Wg).reshape(
            -1, inp.unique_scalars.shape[-1]
        )
        uniq_p = inp.unique_points.reshape(-1, *inp.unique_points.shape[-2:])
    else:
        inputs: List[VerificationInputs] = [
            verification_inputs(curve, p, pk, n, V, t)
            for p, V, t in zip(proofs, commitment_lists, transcripts)
        ]
        weights = [jnp.asarray(fn.encode(draw())) for _ in inputs]
        G_exp = fn.mul(inputs[0].G_exp, weights[0])
        H_exp = fn.mul(inputs[0].H_exp, weights[0])
        g_exp = fn.mul(inputs[0].g_exp, weights[0])
        h_exp = fn.mul(inputs[0].h_exp, weights[0])
        uniq_s_l = [fn.mul(inputs[0].unique_scalars, weights[0])]
        uniq_p_l = [inputs[0].unique_points]
        for inp, w in zip(inputs[1:], weights[1:]):
            G_exp = fn.add(G_exp, fn.mul(inp.G_exp, w))
            H_exp = fn.add(H_exp, fn.mul(inp.H_exp, w))
            g_exp = fn.add(g_exp, fn.mul(inp.g_exp, w))
            h_exp = fn.add(h_exp, fn.mul(inp.h_exp, w))
            uniq_s_l.append(fn.mul(inp.unique_scalars, w))
            uniq_p_l.append(inp.unique_points)
        uniq_s = jnp.concatenate(uniq_s_l, axis=0)
        uniq_p = jnp.concatenate(uniq_p_l, axis=0)

    combined = VerificationInputs(
        unique_scalars=uniq_s,
        unique_points=uniq_p,
        G_exp=G_exp,
        H_exp=H_exp,
        g_exp=g_exp,
        h_exp=h_exp,
    )
    from ..msm.fixed import fixed_base_enabled, fixed_msm

    if mesh is not None:
        from ..parallel import sharded_fixed_msm, sharded_msm

        tp = (mesh.shape.get("tp", 1) if hasattr(mesh, "shape") else 1)
        mn = G_exp.shape[0]
        if fixed_base_enabled() and (2 * mn) % max(tp, 1) == 0:
            # generator lanes on sharded fixed-base tables (table point axis
            # over tp), proof-specific lanes on the sharded ladder
            var_s = jnp.concatenate(
                [uniq_s, g_exp[None], h_exp[None]], axis=0)
            var_p = jnp.concatenate(
                [uniq_p, pk.g[None], pk.h[None]], axis=0)
            fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)
            expected = curve.add(
                sharded_msm(curve, fn.from_mont(var_s), var_p, mesh),
                sharded_fixed_msm(curve, fn.from_mont(fixed_s),
                                  pk.fixed_tables(mn), mesh),
            )
        else:
            scalars, points = combined.msm_inputs(pk)
            expected = sharded_msm(curve, scalars, points, mesh)
    elif fixed_base_enabled():
        # the 2mn shared-generator lanes run on the precomputed fixed-base
        # tables; only the K·(2·log(mn)+m+3)+2 proof-specific lanes ladder
        var_s = jnp.concatenate(
            [uniq_s, g_exp[None], h_exp[None]], axis=0)
        var_p = jnp.concatenate([uniq_p, pk.g[None], pk.h[None]], axis=0)
        fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)
        expected = curve.add(
            msm(curve, fn.from_mont(var_s), var_p),
            fixed_msm(curve, fn.from_mont(fixed_s),
                      pk.fixed_tables(G_exp.shape[0])),
        )
    else:
        scalars, points = combined.msm_inputs(pk)
        expected = msm(curve, scalars, points)
    if not bool(curve.is_identity(expected)):
        raise VerificationError("batch verification failed")


def _batch_verify_dp(curve, pk, inp, W, Wg, K: int, dp: int, mesh) -> None:
    """dp group mega-MSMs over a ("dp", "tp") mesh: the K weighted proofs
    merge into dp groups of K/dp (each group still shares the pk-generator
    terms), group b's MSM runs on mesh row b with its pair axis sharded
    over tp. All dp results must be the identity."""
    from ..parallel import sharded_msm_rows

    fn = curve.fn
    g = K // dp

    def group_sum(x, w):  # (K, ..., L) → (dp, ..., L)
        wx = fn.mul(x, w)
        return fn.sum(wx.reshape(dp, g, *wx.shape[1:]), axis=1)

    G_exp = group_sum(inp.G_exp, Wg)         # (dp, mn, L)
    H_exp = group_sum(inp.H_exp, Wg)
    g_exp = group_sum(inp.g_exp, W)          # (dp, L)
    h_exp = group_sum(inp.h_exp, W)
    u = inp.unique_scalars.shape[1]
    uniq_s = fn.mul(inp.unique_scalars, Wg).reshape(dp, g * u, fn.L)
    uniq_p = inp.unique_points.reshape(
        dp, g * u, *inp.unique_points.shape[-2:])

    scalars = jnp.concatenate(
        [uniq_s, g_exp[:, None], h_exp[:, None], G_exp, H_exp], axis=1)
    shared = jnp.concatenate(
        [pk.g[None], pk.h[None], pk.G_vec, pk.H_vec], axis=0)
    points = jnp.concatenate(
        [uniq_p, jnp.broadcast_to(shared, (dp, *shared.shape))], axis=1)
    expected = sharded_msm_rows(curve, fn.from_mont(scalars), points, mesh)
    if not bool(jnp.all(curve.is_identity(expected))):
        raise VerificationError("batch verification failed")
