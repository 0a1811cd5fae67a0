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

import functools
import secrets
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp

from ..errors import VerificationError
from ..msm import msm
from .range import (
    ProofBatch,
    RangeProof,
    VerificationInputs,
    replay_batch,
    stack_commitments,
    verification_inputs,
    verification_inputs_batch,
)


@functools.lru_cache(maxsize=None)
def _batch_verify_fused_jit(curve, n: int, m: int, K: int, fixed: bool):
    """The ENTIRE homogeneous batch verification after transcript replay as
    ONE compiled program: K proofs' exponent vectors (vmapped), the
    random-linear-combination merge, the variable-lane MSM, the fixed-base
    generator-lane MSM (when `fixed`), and the identity check. Eagerly this
    is ~12 dispatches; on a remote TPU backend each costs ~0.1 s of latency
    while the whole batch's device math is ~10 ms — fusion makes the batch
    path dispatch-count-independent of K (one program, one bool out)."""
    from ..msm.fixed import fixed_msm
    from .range import (
        _vinputs_multiple_batched,
        _vinputs_single_prog,
    )

    # m > 1 uses the batched-NATIVE exponent program (one flattened kernel
    # grid per op); m = 1 stays a vmap of the single-proof program
    vf = (jax.vmap(_vinputs_single_prog(curve, n)) if m == 1
          else _vinputs_multiple_batched(curve, n, m))
    fn = curve.fn
    nbits = fn.order_bits

    def f(ys, zs, ess, efs, rp, sp, dp_, A, Aw, B, L, R, V, W, g, h,
          gen1, gen2):
        uniq_s, G_exp, H_exp, g_exp, h_exp = vf(ys, zs, ess, efs, rp, sp, dp_)
        Wg = W[:, None, :]
        G_exp = fn.sum(fn.mul(G_exp, Wg), axis=0)      # (mn, L)
        H_exp = fn.sum(fn.mul(H_exp, Wg), axis=0)
        g_exp = fn.sum(fn.mul(g_exp, W), axis=0)       # (L,)
        h_exp = fn.sum(fn.mul(h_exp, W), axis=0)
        if m == 1:
            # single verifier pairs [1, e, e²] with [B, A_wip, A] (wip:365-372)
            head = [B[:, None], Aw[:, None], A[:, None]]
        else:
            # aggregated pairs [1, e⁻¹, e⁻²] with [A, A_wip, B]
            head = [A[:, None], Aw[:, None], B[:, None]]
        uniq_p = jnp.concatenate(head + [L, R, V], axis=1)
        uniq_s = fn.mul(uniq_s, Wg).reshape(-1, fn.L)
        uniq_p = uniq_p.reshape(-1, *uniq_p.shape[-2:])
        var_s = jnp.concatenate([uniq_s, g_exp[None], h_exp[None]], axis=0)
        var_p = jnp.concatenate([uniq_p, g[None], h[None]], axis=0)
        if fixed:
            fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)
            out = curve.add(
                msm(curve, fn.from_mont(var_s), var_p),
                fixed_msm(curve, fn.from_mont(fixed_s), gen1, nbits),
            )
        else:
            var_s = jnp.concatenate([var_s, G_exp, H_exp], axis=0)
            var_p = jnp.concatenate([var_p, gen1, gen2], axis=0)
            out = msm(curve, fn.from_mont(var_s), var_p)
        return curve.is_identity(out)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _batch_verify_fused_fs256_jit(curve, n: int, m: int, K: int,
                                  fixed: bool):
    """_batch_verify_fused_jit with the Fiat-Shamir replay IN-GRAPH: every
    proof's fs256 challenges derive from the proof tensors inside the one
    compiled program (vmapped fs256_replay), so sound batch verification
    costs no host point decode or hashing at all — the same dispatch shape
    as deterministic mode."""
    from ..msm.fixed import fixed_msm
    from .fs256 import fs256_replay
    from .range import (
        _vinputs_multiple_batched,
        _vinputs_single_prog,
    )

    fn = curve.fn
    nbits = fn.order_bits

    vf = (jax.vmap(_vinputs_single_prog(curve, n)) if m == 1
          else _vinputs_multiple_batched(curve, n, m))

    def f(rp, sp, dp_, A, Aw, B, L, R, V, W, g, h, gen1, gen2):
        # batched-NATIVE replay: ONE SHA chain whose sequential step count
        # is K-independent (the vmapped per-proof replay scaled ~linearly:
        # 35 ms at K=128 → 135 ms at K=256 of pure transcript overhead)
        ys, zs, ess, efs = fs256_replay(curve, m, V, A, L, R, Aw, B)
        uniq_s, G_exp, H_exp, g_exp, h_exp = vf(
            ys, zs, ess, efs, rp, sp, dp_)
        Wg = W[:, None, :]
        G_exp = fn.sum(fn.mul(G_exp, Wg), axis=0)      # (mn, L)
        H_exp = fn.sum(fn.mul(H_exp, Wg), axis=0)
        g_exp = fn.sum(fn.mul(g_exp, W), axis=0)       # (L,)
        h_exp = fn.sum(fn.mul(h_exp, W), axis=0)
        if m == 1:
            head = [B[:, None], Aw[:, None], A[:, None]]
        else:
            head = [A[:, None], Aw[:, None], B[:, None]]
        uniq_p = jnp.concatenate(head + [L, R, V], axis=1)
        uniq_s = fn.mul(uniq_s, Wg).reshape(-1, fn.L)
        uniq_p = uniq_p.reshape(-1, *uniq_p.shape[-2:])
        var_s = jnp.concatenate([uniq_s, g_exp[None], h_exp[None]], axis=0)
        var_p = jnp.concatenate([uniq_p, g[None], h[None]], axis=0)
        if fixed:
            fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)
            out = curve.add(
                msm(curve, fn.from_mont(var_s), var_p),
                fixed_msm(curve, fn.from_mont(fixed_s), gen1, nbits),
            )
        else:
            var_s = jnp.concatenate([var_s, G_exp, H_exp], axis=0)
            var_p = jnp.concatenate([var_p, gen1, gen2], axis=0)
            out = msm(curve, fn.from_mont(var_s), var_p)
        return curve.is_identity(out)

    return jax.jit(f)


def _batch_verify_fused(curve, pk, n: int, m: int, batch: ProofBatch,
                        V_all, transcripts, draw) -> None:
    """Homogeneous single-device batch verification through the fused
    program. Raises VerificationError on failure."""
    from ..msm.fixed import fixed_base_ok

    fn = curve.fn
    K = len(batch)
    mn = n * m
    if all(
        tr is not None and getattr(tr, "device_graph", False)
        and getattr(tr, "_counter", None) == 0
        for tr in transcripts
    ):
        # fs256: in-graph replay — skip the host decode/hash entirely
        W = jnp.asarray(fn.encode([draw() for _ in range(K)]))
        head = (batch.r_prime, batch.s_prime, batch.d_prime,
                batch.A, batch.A_wip, batch.B, batch.L_vec, batch.R_vec,
                V_all, W, pk.g, pk.h)
        if fixed_base_ok(curve, 2 * mn):
            ok = _batch_verify_fused_fs256_jit(curve, n, m, K, True)(
                *head, pk.fixed_tables(mn), pk.h[None])
        else:
            ok = _batch_verify_fused_fs256_jit(curve, n, m, K, False)(
                *head, pk.G_vec[:mn], pk.H_vec[:mn])
        if not bool(ok):
            raise VerificationError("batch verification failed")
        return
    ys, zs, ess, efs = replay_batch(curve, batch, V_all, n, m, transcripts)
    W = jnp.asarray(fn.encode([draw() for _ in range(K)]))  # (K, L)
    head = (
        jnp.asarray(fn.encode(ys)),
        jnp.asarray(fn.encode(zs)),
        jnp.asarray(fn.encode([e for es in ess for e in es])).reshape(
            K, -1, fn.L),
        jnp.asarray(fn.encode(efs)),
        batch.r_prime, batch.s_prime, batch.d_prime,
        batch.A, batch.A_wip, batch.B, batch.L_vec, batch.R_vec, V_all,
        W, pk.g, pk.h,
    )
    if fixed_base_ok(curve, 2 * mn):
        ok = _batch_verify_fused_jit(curve, n, m, K, True)(
            *head, pk.fixed_tables(mn), pk.h[None])
    else:
        ok = _batch_verify_fused_jit(curve, n, m, K, False)(
            *head, pk.G_vec[:mn], pk.H_vec[:mn])
    if not bool(ok):
        raise VerificationError("batch verification failed")


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
    (default: ShaTranscript — the secure Fiat-Shamir mode matching prove()'s
    default; pass DeterministicTranscript instances for reference-constant
    replay). rng: optional callable returning random weight ints (for
    tests); defaults to 128-bit secrets.
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
    from .wip import _fuse_ok

    if homogeneous and mesh is None and _fuse_ok():
        # single-device fast path (TPU: remote dispatch latency dominates):
        # replay on host, then ONE fused program (exponent vectors + RLC
        # merge + MSMs + identity check). CPU keeps the eager-merged path —
        # its per-(n, m, K) fused compiles cost more than they save.
        batch = (proofs if isinstance(proofs, ProofBatch)
                 else ProofBatch.from_proofs(proofs))
        V_all = stack_commitments(curve, commitment_lists)
        m = V_all.shape[1]
        if n * m != (1 << batch.rounds):
            raise VerificationError()
        _batch_verify_fused(curve, pk, n, m, batch, V_all, transcripts, draw)
        return
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
    from ..msm.fixed import fixed_base_ok, fixed_msm

    mn = G_exp.shape[0]
    if mesh is not None:
        from ..parallel import sharded_fixed_msm, sharded_msm

        tp = (mesh.shape.get("tp", 1) if hasattr(mesh, "shape") else 1)
        if fixed_base_ok(curve, 2 * mn) and (2 * mn) % max(tp, 1) == 0:
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
                                  pk.fixed_tables(mn, layout="xla"), mesh),
            )
        else:
            scalars, points = combined.msm_inputs(pk)
            expected = sharded_msm(curve, scalars, points, mesh)
    elif fixed_base_ok(curve, 2 * mn):
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
    from ..parallel.sharded_msm import replicated_all_identity

    if not replicated_all_identity(curve, expected, mesh):
        raise VerificationError("batch verification failed")


def batch_verify_identify(
    curve,
    pk,
    n: int,
    proofs,
    commitment_lists,
    transcript_factory=None,
    mesh=None,
    rng=None,
) -> List[int]:
    """Fault-isolating batch verification: verify the whole batch in one
    RLC mega-MSM; on failure, BISECT by re-dispatching sub-batches until
    the offending proofs are identified. Returns the sorted indices of bad
    proofs ([] = every proof verified).

    This is the per-shard failure re-dispatch SURVEY.md §5 asks of the
    batch verifier: a failed group costs O(bad · log K) extra group
    dispatches instead of failing the whole batch opaquely, and healthy
    shards are certified by their own passing sub-batch.

    transcript_factory: index → FRESH transcript for that proof (needed
    because transcripts are stateful and each re-dispatch replays them);
    None = the secure ShaTranscript default, minted fresh per dispatch.
    """
    if not isinstance(proofs, ProofBatch):
        proofs = ProofBatch.from_proofs(proofs)
    V_all = stack_commitments(curve, commitment_lists)

    def trs(lo, hi):
        if transcript_factory is None:
            return None
        return [transcript_factory(i) for i in range(lo, hi)]

    def rec(lo: int, hi: int) -> List[int]:
        try:
            batch_verify(curve, pk, n, proofs[lo:hi], V_all[lo:hi],
                         transcripts=trs(lo, hi), mesh=mesh, rng=rng)
            return []
        except VerificationError:
            if hi - lo == 1:
                return [lo]
            mid = (lo + hi) // 2
            return rec(lo, mid) + rec(mid, hi)

    return rec(0, len(proofs))
