"""Range proofs (single and aggregated) as array programs.

Mirrors the reference's src/range/mod.rs: prove dispatch (:31-55), single
(:80-238) and aggregated (:240-510) paths, with every O(mn) per-element loop
turned into a whole-array op and the verifier flattened into ONE multi-scalar
multiplication that must equal the identity (:479-509) — the shape that
batch-verifies and shards across a TPU mesh.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..errors import (
    InvalidAggregation,
    InvalidBitsize,
    InvalidGeneratorsLength,
    VerificationError,
)
from ..msm import msm, tree_sum
from ..transcript import Fs256Transcript, ShaTranscript, SystemRng
from .publickey import PublicKey
from .wip import WipProof, verification_scalars, wip_prove


@dataclasses.dataclass
class RangeProof:
    """A (the bit-commitment) + the WIP argument (range/mod.rs:25-28)."""

    A: jnp.ndarray
    proof: WipProof

    def to_golden(self, curve):
        """Decode to the pure-Python golden proof type (differential tests,
        serialization)."""
        from ..golden.protocol import RangeProof as GRangeProof
        from ..golden.protocol import WipProof as GWipProof

        fn = curve.fn
        w = self.proof
        return GRangeProof(
            A=curve.decode_point(self.A),
            proof=GWipProof(
                L_vec=curve.decode_points(w.L_vec),
                R_vec=curve.decode_points(w.R_vec),
                A=curve.decode_point(w.A),
                B=curve.decode_point(w.B),
                r_prime=fn.decode(w.r_prime),
                s_prime=fn.decode(w.s_prime),
                d_prime=fn.decode(w.d_prime),
            ),
        )

    @classmethod
    def from_golden(cls, curve, g) -> "RangeProof":
        fn = curve.fn
        return cls(
            A=jnp.asarray(curve.encode_point(g.A)),
            proof=WipProof(
                L_vec=jnp.asarray(curve.encode_points(g.proof.L_vec)),
                R_vec=jnp.asarray(curve.encode_points(g.proof.R_vec)),
                A=jnp.asarray(curve.encode_point(g.proof.A)),
                B=jnp.asarray(curve.encode_point(g.proof.B)),
                r_prime=jnp.asarray(fn.encode(g.proof.r_prime)),
                s_prime=jnp.asarray(fn.encode(g.proof.s_prime)),
                d_prime=jnp.asarray(fn.encode(g.proof.d_prime)),
            ),
        )


@dataclasses.dataclass
class ProofBatch:
    """K homogeneous range proofs (same n, m) as pre-stacked arrays.

    batch_prove() produces its per-proof tensors with a leading K axis
    already; keeping them stacked (instead of slicing into K RangeProofs
    that batch_verify would immediately re-stack) removes ~130+ host
    dispatches per batch — measured 1.7 s of jnp.stack overhead at K=64 on
    a remote TPU backend. Indexable/iterable as a sequence of RangeProof
    for API parity with the one-at-a-time path (range/mod.rs:31-55)."""

    A: jnp.ndarray        # (K, C, L) bit commitments
    L_vec: jnp.ndarray    # (K, rounds, C, L)
    R_vec: jnp.ndarray    # (K, rounds, C, L)
    A_wip: jnp.ndarray    # (K, C, L)
    B: jnp.ndarray        # (K, C, L)
    r_prime: jnp.ndarray  # (K, L) Montgomery
    s_prime: jnp.ndarray  # (K, L)
    d_prime: jnp.ndarray  # (K, L)

    @property
    def rounds(self) -> int:
        return self.L_vec.shape[1]

    def __len__(self) -> int:
        return self.A.shape[0]

    def __getitem__(self, i):
        if isinstance(i, slice):
            return ProofBatch(
                A=self.A[i], L_vec=self.L_vec[i], R_vec=self.R_vec[i],
                A_wip=self.A_wip[i], B=self.B[i], r_prime=self.r_prime[i],
                s_prime=self.s_prime[i], d_prime=self.d_prime[i],
            )
        return RangeProof(A=self.A[i], proof=WipProof(
            L_vec=self.L_vec[i], R_vec=self.R_vec[i],
            A=self.A_wip[i], B=self.B[i],
            r_prime=self.r_prime[i], s_prime=self.s_prime[i],
            d_prime=self.d_prime[i],
        ))

    def __iter__(self):
        return (self[i] for i in range(len(self)))

    @classmethod
    def from_proofs(cls, proofs: Sequence[RangeProof]) -> "ProofBatch":
        return cls(
            A=jnp.stack([p.A for p in proofs]),
            L_vec=jnp.stack([p.proof.L_vec for p in proofs]),
            R_vec=jnp.stack([p.proof.R_vec for p in proofs]),
            A_wip=jnp.stack([p.proof.A for p in proofs]),
            B=jnp.stack([p.proof.B for p in proofs]),
            r_prime=jnp.stack([p.proof.r_prime for p in proofs]),
            s_prime=jnp.stack([p.proof.s_prime for p in proofs]),
            d_prime=jnp.stack([p.proof.d_prime for p in proofs]),
        )


@dataclasses.dataclass
class RangeProver:
    """Witness container (range/prover.rs:13-42)."""

    v_vec: List[int] = dataclasses.field(default_factory=list)
    gamma_vec: List[int] = dataclasses.field(default_factory=list)
    commitment_vec: List[jnp.ndarray] = dataclasses.field(default_factory=list)

    def commit(self, pk: PublicKey, v: int, gamma: int) -> jnp.ndarray:
        V = pk.commitment(v, gamma)
        self.v_vec.append(v)
        self.gamma_vec.append(gamma)
        self.commitment_vec.append(V)
        return V


def _bit_decompose(v: Sequence[int], n: int, m: int) -> np.ndarray:
    """v_bits[i] = bit (i % n) of v[i // n] (range/mod.rs:263-277)."""
    return np.array(
        [(v[i // n] >> (i % n)) & 1 for i in range(n * m)], dtype=bool
    )


def _validate(pk, n: int, m: int) -> None:
    """Argument checks, mirroring the reference's error taxonomy
    (errors.rs:27 InvalidBitsize, :31-35 InvalidAggregation, :37-41
    InvalidGeneratorsLength)."""
    if n not in (8, 16, 32, 64):
        raise InvalidBitsize()
    if m < 1 or (m & (m - 1)) != 0:
        raise InvalidAggregation(m)
    if pk.length < n * m:
        raise InvalidGeneratorsLength()


def pk_prefix(pk: PublicKey, mn: int) -> PublicKey:
    """The reference accepts generator sets LONGER than n·m (only shorter
    errors, errors.rs:37-41) and uses the first n·m generators; slice a
    prefix view accordingly."""
    if pk.length == mn:
        return pk
    return PublicKey(curve=pk.curve, g=pk.g, h=pk.h,
                     G_vec=pk.G_vec[:mn], H_vec=pk.H_vec[:mn])


def prove(
    curve,
    pk: PublicKey,
    n: int,
    prover: RangeProver,
    transcript=None,
    rng=None,
) -> RangeProof:
    m = len(prover.v_vec)
    _validate(pk, n, m)
    pk = pk_prefix(pk, n * m)
    # SECURE BY DEFAULT: real Fiat-Shamir challenges + cryptographically
    # random blindings. The reference's stripped-transcript constants
    # (SURVEY.md §2.9) are opt-in via transcript=DeterministicTranscript(m),
    # rng=DeterministicRng(m) — the differential-test mode, NOT a proof.
    # Default transcript: fs256 (documented word-aligned SHA-256 chain with
    # a byte-exact device twin — the sound mode that runs as ONE compiled
    # dispatch on both the prover and verifier; docs/DESIGN.md §transcripts).
    transcript = transcript or Fs256Transcript(m)
    rng = rng or SystemRng(curve.fn.p)
    if m == 1:
        return _prove_single(
            curve, pk, n, prover.v_vec[0], prover.gamma_vec[0],
            prover.commitment_vec[0], transcript, rng,
        )
    return _prove_multiple(
        curve, pk, n, m, prover.v_vec, prover.gamma_vec,
        prover.commitment_vec, transcript, rng,
    )


def verify(
    curve,
    proof: RangeProof,
    pk: PublicKey,
    n: int,
    commitment_vec,
    transcript=None,
) -> None:
    """Raises VerificationError unless the proof verifies (range/mod.rs:57-78)."""
    commitment_vec = (
        list(commitment_vec)
        if not hasattr(commitment_vec, "shape")
        else [commitment_vec[i] for i in range(commitment_vec.shape[0])]
    )
    m = len(commitment_vec)
    try:
        _validate(pk, n, m)
    except Exception as exc:
        # the reference's verify reports every failure as VerificationError
        # (SURVEY.md §2.8: the only variant actually produced)
        raise VerificationError(str(exc) or "invalid arguments")
    pk = pk_prefix(pk, n * m)
    transcript = transcript or Fs256Transcript(m)  # match prove()'s default
    if m == 1:
        _verify_single(curve, proof, pk, n, commitment_vec[0], transcript)
    else:
        _verify_multiple(curve, proof, pk, n, m, commitment_vec, transcript)


# ---------------------------------------------------------------------------
# single (m = 1): range/mod.rs:80-238
# ---------------------------------------------------------------------------

def _bit_commitment_prog(curve):
    def f(alpha_plain, bits, G_vec, H_vec, h):
        # width-1 msm reuses the shared small-MSM program (no 1-wide compile)
        h_alpha = msm(curve, alpha_plain[None], h[None])
        chosen = curve.select(bits, G_vec, curve.neg(H_vec))
        return tree_sum(
            curve, jnp.concatenate([h_alpha[None], chosen], axis=0)
        )

    return f


def _bit_commitment_batch_prog(curve):
    """K bit commitments WITHOUT vmap: the select carries a leading K axis
    and tree_sum reduces groups natively (its Pallas grouped-sum kernel
    does not compile under vmap batching, and the vmapped XLA tree paid
    the (N, C, L) tile-padding tax — measured 83 ms for K=16, mn=1024)."""
    def f(alpha_plain, bits, G_vec, H_vec, h):
        # alpha_plain: (K, Ls); bits: (K, mn)
        from ..msm.engine import _ladder_ok

        K = bits.shape[0]
        hb = jnp.broadcast_to(h, (K, *h.shape))
        if _ladder_ok(curve):
            # K lanes of full scalar-mul: the XLA scan ladder pays the
            # (N, C, L) layout tax on ~335 sequential point ops (measured
            # ~80 ms of the K=16 bit-commitment program); one padded
            # Pallas ladder block does it in noise
            from ..curves.pallas_curve import ladder_scalar_mul

            h_alpha = ladder_scalar_mul(
                curve, alpha_plain, hb, curve.fn.order_bits)
        else:
            h_alpha = msm(curve, alpha_plain[:, None], hb[:, None])
        # curve.select broadcasts the (K, mn) mask over the point dims itself
        chosen = curve.select(bits, G_vec, curve.neg(H_vec))  # (K, mn, C, L)
        return tree_sum(
            curve, jnp.concatenate([h_alpha[:, None], chosen], axis=1)
        )

    return f


@functools.lru_cache(maxsize=None)
def _bit_commitment_jit(curve, mn: int):
    import jax

    return jax.jit(_bit_commitment_prog(curve))


def _bit_commitment(curve, pk, alpha_int, v_bits, mn):
    """A = h·α + Σ (bitᵢ ? Gᵢ : −Hᵢ)  (range/mod.rs:96-106, :259-277).

    On TPU: one compiled program per (curve, mn) — remote dispatch latency
    dominates every sub-millisecond op. On CPU: eager (shared programs)."""
    from .wip import _fuse_ok

    fn = curve.fn
    args = (
        jnp.asarray(fn.encode_plain(alpha_int)),
        jnp.asarray(v_bits),
        pk.G_vec, pk.H_vec, pk.h,
    )
    if _fuse_ok():
        return _bit_commitment_jit(curve, mn)(*args)
    return _bit_commitment_prog(curve)(*args)


def _prove_setup_single_prog(curve, n: int):
    """Everything between (y, z) and the WIP call (range/mod.rs:112-184):
    a_vec, b_vec, y-powers, α̂ — one compiled program on TPU.

    The reference also computes Â here (range/mod.rs:126-151) and passes it
    to the WIP prover as P — but the prover never reads P (the running
    P += e²L + e⁻²R is dead work, see wip._round_fold_core), and the
    verifier reconstructs Â inside its own mega-MSM. Dropping the Â MSM
    (width mn+m+3 of full scalar-muls) cut the measured batch-prove setup
    stage from 320 ms to field-only work at K=16, n=64, m=16."""
    fn = curve.fn

    def f(y_m, z_m, bits, gamma_m, alpha_m, A, V, G_vec, H_vec, g):
        power_of_two = jnp.asarray(
            fn.encode([pow(2, i, fn.p) for i in range(n)])
        )
        power_of_y = fn.powers_type2(y_m, n)
        power_of_y_rev = power_of_y[::-1]

        minus_z = fn.neg(z_m)
        H_exp = fn.add(fn.mul(power_of_two, power_of_y_rev), z_m)  # (n, L)
        V_exp = fn.powers_type2(y_m, n + 1)[n]  # y^{n+1}

        one_m = jnp.asarray(fn.one_np)
        one_minus_z = fn.sub(one_m, z_m)
        a_vec = fn.select(bits, jnp.broadcast_to(one_minus_z, (n, fn.L)),
                          jnp.broadcast_to(minus_z, (n, fn.L)))
        b_vec = fn.select(bits, H_exp, fn.sub(H_exp, one_m))
        alpha_hat = fn.add(alpha_m, fn.mul(gamma_m, V_exp))
        return a_vec, b_vec, power_of_y, alpha_hat

    return f


@functools.lru_cache(maxsize=None)
def _prove_setup_single_jit(curve, n: int):
    import jax

    return jax.jit(_prove_setup_single_prog(curve, n))


def _prove_single(curve, pk, n, v, gamma, commitment, transcript, rng):
    from .wip import _fuse_ok

    fn = curve.fn
    assert pk.length == n, "generator count must equal n"

    alpha = rng.alpha()
    v_bits = _bit_decompose([v], n, 1)
    A = _bit_commitment(curve, pk, alpha, v_bits, n)

    y, z = transcript.challenge_yz(curve, [commitment], A)

    setup = (_prove_setup_single_jit(curve, n) if _fuse_ok()
             else _prove_setup_single_prog(curve, n))
    a_vec, b_vec, power_of_y, alpha_hat = setup(
        jnp.asarray(fn.encode(y)),
        jnp.asarray(fn.encode(z)),
        jnp.asarray(v_bits),
        jnp.asarray(fn.encode(gamma)),
        jnp.asarray(fn.encode(alpha)),
        A, commitment, pk.G_vec, pk.H_vec, pk.g,
    )

    wip = wip_prove(
        curve, pk, a_vec, b_vec, power_of_y, alpha_hat, transcript, rng
    )
    return RangeProof(A=A, proof=wip)


def _replay_challenges(curve, proof, m, logn, commitment_vec, transcript):
    """Host-side Fiat-Shamir replay shared by every verify path. Returns
    (y, z, es, e) as ints; raises VerificationError on zero challenges."""
    fn = curve.fn
    wproof = proof.proof
    y, z = transcript.challenge_yz(curve, list(commitment_vec), proof.A)
    es = [
        transcript.round_challenge(
            curve, wproof.L_vec[i], wproof.R_vec[i]) % fn.p
        for i in range(logn)
    ]
    e = transcript.final_challenge(curve, wproof.A, wproof.B) % fn.p
    if any(c == 0 for c in es) or e == 0 or y % fn.p == 0 or z % fn.p == 0:
        raise VerificationError()
    return y, z, es, e


@functools.lru_cache(maxsize=None)
def _verify_fused_jit(curve, n: int, m: int):
    """The ENTIRE verification after transcript replay as ONE compiled
    program: exponent vectors + the single mega-MSM + the identity check
    (range/mod.rs:479-509). Eagerly this is ~5 dispatches (exponent
    program, concats, MSM canonicalization, identity) — on a remote TPU
    backend each costs ~0.1 s of latency; fused it is one."""
    import jax

    base = (_vinputs_single_prog(curve, n) if m == 1
            else _vinputs_multiple_jit(curve, n, m))
    fn = curve.fn

    def f(y, z, es, e, rp, sp, dp_, A, Aw, B, L, R, V, g, h, G_vec, H_vec):
        uniq_s, G_exp, H_exp, g_exp, h_exp = base(y, z, es, e, rp, sp, dp_)
        if m == 1:
            head_p = [B[None], Aw[None], A[None]]   # pairs [1, e, e²]
        else:
            head_p = [A[None], Aw[None], B[None]]   # pairs [1, e⁻¹, e⁻²]
        scalars = jnp.concatenate(
            [uniq_s, g_exp[None], h_exp[None], G_exp, H_exp], axis=0)
        points = jnp.concatenate(
            head_p + [L, R, V, g[None], h[None], G_vec, H_vec], axis=0)
        out = msm(curve, fn.from_mont(scalars), points)
        return curve.is_identity(out)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _verify_fused_fb_jit(curve, n: int, m: int):
    """_verify_fused_jit with the 2mn fixed generator lanes routed through
    the precomputed fixed-base tables (msm/fixed.py) instead of the ladder:
    only the ~2·log2(mn)+m+5 proof-specific lanes run full scalar-muls."""
    import jax

    from ..msm.fixed import fixed_msm

    base = (_vinputs_single_prog(curve, n) if m == 1
            else _vinputs_multiple_jit(curve, n, m))
    fn = curve.fn

    def f(y, z, es, e, rp, sp, dp_, A, Aw, B, L, R, V, g, h, table):
        uniq_s, G_exp, H_exp, g_exp, h_exp = base(y, z, es, e, rp, sp, dp_)
        if m == 1:
            head_p = [B[None], Aw[None], A[None]]   # pairs [1, e, e²]
        else:
            head_p = [A[None], Aw[None], B[None]]   # pairs [1, e⁻¹, e⁻²]
        var_s = jnp.concatenate([uniq_s, g_exp[None], h_exp[None]], axis=0)
        var_p = jnp.concatenate(head_p + [L, R, V, g[None], h[None]], axis=0)
        fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)
        out = curve.add(
            msm(curve, fn.from_mont(var_s), var_p),
            fixed_msm(curve, fn.from_mont(fixed_s), table),
        )
        return curve.is_identity(out)

    return jax.jit(f)


@functools.lru_cache(maxsize=None)
def _verify_fused_fs256_jit(curve, n: int, m: int, fixed: bool):
    """Sound single-proof verification as ONE compiled program: the fs256
    Fiat-Shamir replay runs IN-GRAPH (protocol/fs256.py::fs256_replay — no
    host point decode, no host hashing), then the exponent vectors, the
    mega-MSM (fixed-base tables for the 2mn generator lanes when `fixed`)
    and the identity check. The device twin of _replay_challenges +
    _verify_fused_jit for Fs256Transcript verifiers."""
    import jax

    from ..msm.fixed import fixed_msm
    from .fs256 import fs256_replay

    base = (_vinputs_single_prog(curve, n) if m == 1
            else _vinputs_multiple_jit(curve, n, m))
    fn = curve.fn

    def f(rp, sp, dp_, A, Aw, B, L, R, V, g, h, gen1, gen2):
        y, z, es, e = fs256_replay(curve, m, V, A, L, R, Aw, B)
        uniq_s, G_exp, H_exp, g_exp, h_exp = base(y, z, es, e, rp, sp, dp_)
        if m == 1:
            head_p = [B[None], Aw[None], A[None]]   # pairs [1, e, e²]
        else:
            head_p = [A[None], Aw[None], B[None]]   # pairs [1, e⁻¹, e⁻²]
        if fixed:
            var_s = jnp.concatenate(
                [uniq_s, g_exp[None], h_exp[None]], axis=0)
            var_p = jnp.concatenate(
                head_p + [L, R, V, g[None], h[None]], axis=0)
            fixed_s = jnp.concatenate([G_exp, H_exp], axis=0)
            out = curve.add(
                msm(curve, fn.from_mont(var_s), var_p),
                fixed_msm(curve, fn.from_mont(fixed_s), gen1),
            )
        else:
            scalars = jnp.concatenate(
                [uniq_s, g_exp[None], h_exp[None], G_exp, H_exp], axis=0)
            points = jnp.concatenate(
                head_p + [L, R, V, g[None], h[None], gen1, gen2], axis=0)
            out = msm(curve, fn.from_mont(scalars), points)
        return curve.is_identity(out)

    return jax.jit(f)


def _verify_fused(curve, proof, pk, n, m, commitment_vec, transcript):
    fn = curve.fn
    mn = n * m
    wproof = proof.proof
    logn = wproof.rounds
    if mn != (1 << logn):
        raise VerificationError()
    from ..msm.fixed import fixed_base_ok

    fixed = fixed_base_ok(curve, 2 * mn)
    if (getattr(transcript, "device_graph", False)
            and getattr(transcript, "_counter", None) == 0):
        # fs256: replay runs inside the compiled program — sound verify in
        # ONE dispatch with no host decode/hashing
        gens = ((pk.fixed_tables(mn), pk.h[None]) if fixed
                else (pk.G_vec[:mn], pk.H_vec[:mn]))
        ok = _verify_fused_fs256_jit(curve, n, m, fixed)(
            wproof.r_prime, wproof.s_prime, wproof.d_prime,
            proof.A, wproof.A, wproof.B, wproof.L_vec, wproof.R_vec,
            jnp.stack(list(commitment_vec)), pk.g, pk.h, *gens)
        if not bool(ok):
            raise VerificationError()
        return
    y, z, es, e = _replay_challenges(
        curve, proof, m, logn, commitment_vec, transcript)
    head = (
        jnp.asarray(fn.encode(y)),
        jnp.asarray(fn.encode(z)),
        jnp.asarray(fn.encode(es)),
        jnp.asarray(fn.encode(e)),
        wproof.r_prime, wproof.s_prime, wproof.d_prime,
        proof.A, wproof.A, wproof.B, wproof.L_vec, wproof.R_vec,
        jnp.stack(list(commitment_vec)), pk.g, pk.h,
    )
    if fixed:
        ok = _verify_fused_fb_jit(curve, n, m)(*head, pk.fixed_tables(mn))
    else:
        ok = _verify_fused_jit(curve, n, m)(
            *head, pk.G_vec[:mn], pk.H_vec[:mn])
    if not bool(ok):
        raise VerificationError()


def _verify_single(curve, proof, pk, n, commitment, transcript):
    from .wip import _fuse_ok

    if _fuse_ok():
        _verify_fused(curve, proof, pk, n, 1, [commitment], transcript)
        return
    inputs = _verification_inputs_single(curve, proof, pk, n, commitment,
                                         transcript)
    _check_identity_msm(curve, pk, inputs)


def _verification_inputs_single(curve, proof, pk, n, commitment, transcript):
    fn = curve.fn
    y, z = transcript.challenge_yz(curve, [commitment], proof.A)
    y_m = jnp.asarray(fn.encode(y))
    z_m = jnp.asarray(fn.encode(z))

    power_of_two = jnp.asarray(fn.encode([pow(2, i, fn.p) for i in range(n)]))
    power_of_y = fn.powers_type2(y_m, n)
    power_of_y_rev = power_of_y[::-1]

    G_exp = jnp.broadcast_to(fn.neg(z_m), (n, fn.L))
    H_exp = fn.add(fn.mul(power_of_two, power_of_y_rev), z_m)
    V_exp = fn.powers_type2(y_m, n + 1)[n]
    z_sqr = fn.mul(z_m, z_m)
    g_exp = fn.mul(fn.sum(power_of_y), fn.sub(z_m, z_sqr))
    two_n_minus_1 = jnp.asarray(fn.encode((pow(2, n, fn.p) - 1) % fn.p))
    g_exp = fn.sub(g_exp, fn.mul(fn.mul(two_n_minus_1, V_exp), z_m))

    return _wip_verification_inputs(
        curve, pk, proof.proof, power_of_y, G_exp, H_exp, g_exp,
        V_exp[None], proof.A, jnp.stack([commitment]), transcript,
    )


def verification_inputs(curve, proof, pk, n, commitment_vec, transcript=None):
    """One proof's verification-MSM inputs (for batch verification)."""
    commitment_vec = list(commitment_vec)
    m = len(commitment_vec)
    pk = pk_prefix(pk, n * m)
    transcript = transcript or Fs256Transcript(m)
    if m == 1:
        return _verification_inputs_single(
            curve, proof, pk, n, commitment_vec[0], transcript
        )
    return _verification_inputs_multiple(
        curve, proof, pk, n, m, commitment_vec, transcript
    )


def _wip_verification_inputs(
    curve, pk, wproof, power_of_y, G_exp_comm, H_exp_comm, g_exp_comm,
    V_exp_comm, A_prime, V, transcript,
):
    """Exponent vectors of the single-MSM WIP verification (wip:238-328),
    split into proof-unique terms and shared-generator (pk) terms so batch
    verification can merge the pk terms across proofs."""
    fn = curve.fn
    logn = wproof.rounds
    n = 1 << logn
    if G_exp_comm.shape[0] != n or H_exp_comm.shape[0] != n:
        raise VerificationError()
    y = power_of_y[0]

    challenges_sqr, challenges_inv_sqr, s_vec, e = verification_scalars(
        curve, wproof, n, transcript
    )
    s_prime_vec = s_vec[::-1]
    e_sqr = fn.mul(e, e)
    r_prime_e_y = fn.mul(fn.mul(wproof.r_prime, e), y)
    s_prime_e = fn.mul(wproof.s_prime, e)

    Ls_exp = fn.mul(challenges_sqr, e_sqr)
    Rs_exp = fn.mul(challenges_inv_sqr, e_sqr)

    y_inv = fn.inv(y)
    pow_y_inv = fn.powers_type2(y_inv, n)
    G_exp = fn.sub(
        fn.mul(G_exp_comm, e_sqr),
        fn.mul(fn.mul(s_vec, pow_y_inv), r_prime_e_y),
    )
    H_exp = fn.sub(fn.mul(H_exp_comm, e_sqr), fn.mul(s_prime_vec, s_prime_e))
    g_exp = fn.add(
        fn.neg(fn.mul(fn.mul(wproof.r_prime, y), wproof.s_prime)),
        fn.mul(g_exp_comm, e_sqr),
    )
    h_exp = fn.neg(wproof.d_prime)
    V_exp = fn.mul(V_exp_comm, e_sqr)

    one_m = jnp.asarray(fn.one_np)
    return VerificationInputs(
        unique_scalars=jnp.concatenate(
            [one_m[None], e[None], e_sqr[None], Ls_exp, Rs_exp, V_exp], axis=0
        ),
        unique_points=jnp.concatenate(
            [wproof.B[None], wproof.A[None], A_prime[None],
             wproof.L_vec, wproof.R_vec, V], axis=0
        ),
        G_exp=G_exp,
        H_exp=H_exp,
        g_exp=g_exp,
        h_exp=h_exp,
    )


def stack_commitments(curve, commitment_lists) -> jnp.ndarray:
    """(K, m, C, L) commitment tensor from K per-proof commitment lists.
    A pre-stacked array passes through unchanged — the form batch callers
    should hold statements in (one stack, not K·m per-array dispatches)."""
    if isinstance(commitment_lists, jnp.ndarray):
        return commitment_lists
    K = len(commitment_lists)
    m = len(commitment_lists[0])
    V_flat = jnp.stack([v for V in commitment_lists for v in V])
    return V_flat.reshape(K, m, *V_flat.shape[-2:])


def replay_batch(curve, batch: "ProofBatch", V_all, n: int, m: int,
                 transcripts):
    """Host-side Fiat-Shamir replay for a homogeneous batch. Returns
    (ys, zs, ess, efs) int lists; raises VerificationError on zero
    challenges. Deterministic transcripts never look at their point
    arguments; hash transcripts get host views fetched ONCE per stacked
    tensor (not once per proof)."""
    fn = curve.fn
    K = len(batch)
    mn = n * m
    logn = mn.bit_length() - 1
    deterministic = all(
        tr is not None and getattr(tr, "challenges_known_ahead", False)
        for tr in transcripts
    )
    if deterministic:
        A_np = Aw_np = B_np = L_np = R_np = V_np = [None] * K
    else:
        # ONE fetch per tensor, then ONE batched affine decode each (a
        # single host batch inversion instead of a Fermat pow per point);
        # transcripts consume the pre-decoded (x, y) tuples directly
        A_np = curve.decode_points(np.asarray(batch.A))
        Aw_np = curve.decode_points(np.asarray(batch.A_wip))
        B_np = curve.decode_points(np.asarray(batch.B))
        L_flat = curve.decode_points(
            np.asarray(batch.L_vec).reshape(K * logn, *batch.L_vec.shape[-2:]))
        R_flat = curve.decode_points(
            np.asarray(batch.R_vec).reshape(K * logn, *batch.R_vec.shape[-2:]))
        L_np = [L_flat[i * logn:(i + 1) * logn] for i in range(K)]
        R_np = [R_flat[i * logn:(i + 1) * logn] for i in range(K)]
        V_flat = curve.decode_points(
            np.asarray(V_all).reshape(K * m, *V_all.shape[-2:]))
        V_np = [V_flat[i * m:(i + 1) * m] for i in range(K)]
    ys, zs, ess, efs = [], [], [], []
    for i, tr in enumerate(transcripts):
        tr = tr or Fs256Transcript(m)
        y, z = tr.challenge_yz(curve, list(V_np[i] if V_np[i] is not None
                                           else [None] * m), A_np[i])
        es = [
            tr.round_challenge(
                curve,
                L_np[i][j] if L_np[i] is not None else None,
                R_np[i][j] if R_np[i] is not None else None,
            ) % fn.p
            for j in range(logn)
        ]
        e = tr.final_challenge(curve, Aw_np[i], B_np[i]) % fn.p
        if any(c == 0 for c in es) or e == 0 or y % fn.p == 0 or z % fn.p == 0:
            raise VerificationError()
        ys.append(y)
        zs.append(z)
        ess.append(es)
        efs.append(e)
    return ys, zs, ess, efs


def verification_inputs_batch(curve, proofs, pk, n, commitments,
                              transcripts):
    """Stacked verification inputs over a leading K axis for a HOMOGENEOUS
    batch (same n and m for every proof): per-proof host transcript
    replay, then ONE vmapped device program computes every proof's exponent
    vectors (K sequential per-proof programs would be dispatch-bound on a
    remote TPU backend — measured 2.6 s vs 0.15 s for the MSM at K=64).
    m=1 and m>1 use their respective verifier equations (e² vs e⁻² form,
    range/mod.rs:189-238 vs :405-510) — both vmapped.

    proofs: a ProofBatch (zero re-stacking) or a sequence of RangeProof.
    commitments: (K, m, C, L) array or K per-proof commitment lists."""
    fn = curve.fn
    if not isinstance(proofs, ProofBatch):
        proofs = ProofBatch.from_proofs(proofs)
    batch = proofs
    V_all = stack_commitments(curve, commitments)
    K, m = V_all.shape[0], V_all.shape[1]
    mn = n * m
    if len(batch) != K or mn != (1 << batch.rounds):
        raise VerificationError()

    ys, zs, ess, efs = replay_batch(curve, batch, V_all, n, m, transcripts)

    vf = (_vinputs_single_jit_vmap(curve, n) if m == 1
          else _vinputs_multiple_jit_vmap(curve, n, m))
    uniq_s, G_exp, H_exp, g_exp, h_exp = vf(
        jnp.asarray(fn.encode(ys)),
        jnp.asarray(fn.encode(zs)),
        jnp.asarray(np.stack([fn.encode(es) for es in ess])),
        jnp.asarray(fn.encode(efs)),
        batch.r_prime, batch.s_prime, batch.d_prime,
    )
    if m == 1:
        # single verifier pairs [1, e, e²] with [B, A_wip, A] (wip:365-372)
        head = [batch.B[:, None], batch.A_wip[:, None], batch.A[:, None]]
    else:
        # aggregated pairs [1, e⁻¹, e⁻²] with [A, A_wip, B]
        head = [batch.A[:, None], batch.A_wip[:, None], batch.B[:, None]]
    uniq_p = jnp.concatenate(
        head + [batch.L_vec, batch.R_vec, V_all], axis=1
    )
    return VerificationInputs(
        unique_scalars=uniq_s,   # (K, k, L)
        unique_points=uniq_p,    # (K, k, C, L)
        G_exp=G_exp,             # (K, mn, L)
        H_exp=H_exp,
        g_exp=g_exp,             # (K, L)
        h_exp=h_exp,
    )


@dataclasses.dataclass
class VerificationInputs:
    """One proof's verification-MSM inputs, with pk-generator exponents kept
    separate so a batch of proofs over one pk merges into a single MSM of
    size 2mn + Σ(2·log(mn) + m + 3) + 2 instead of Σ(2mn + ...)."""

    unique_scalars: jnp.ndarray  # (k, L) Montgomery
    unique_points: jnp.ndarray   # (k, C, L)
    G_exp: jnp.ndarray           # (mn, L) Montgomery
    H_exp: jnp.ndarray           # (mn, L)
    g_exp: jnp.ndarray           # (L,)
    h_exp: jnp.ndarray           # (L,)

    def msm_inputs(self, pk):
        fn = pk.curve.fn
        scalars = jnp.concatenate(
            [self.unique_scalars, self.g_exp[None], self.h_exp[None],
             self.G_exp, self.H_exp], axis=0
        )
        points = jnp.concatenate(
            [self.unique_points, pk.g[None], pk.h[None], pk.G_vec, pk.H_vec],
            axis=0,
        )
        return fn.from_mont(scalars), points


def _check_identity_msm(curve, pk, inputs: VerificationInputs, mesh=None):
    scalars, points = inputs.msm_inputs(pk)
    if mesh is not None:
        from ..parallel import sharded_msm

        expected = sharded_msm(curve, scalars, points, mesh)
    else:
        expected = msm(curve, scalars, points)
    if not bool(curve.is_identity(expected)):
        raise VerificationError()


def _wip_verify(
    curve, pk, wproof, power_of_y, G_exp_comm, H_exp_comm, g_exp_comm,
    V_exp_comm, A_prime, V, transcript,
):
    """Single-MSM WIP verification (wip:238-328). Raises on failure."""
    inputs = _wip_verification_inputs(
        curve, pk, wproof, power_of_y, G_exp_comm, H_exp_comm, g_exp_comm,
        V_exp_comm, A_prime, V, transcript,
    )
    _check_identity_msm(curve, pk, inputs)


# ---------------------------------------------------------------------------
# aggregated (m > 1): range/mod.rs:240-510
# ---------------------------------------------------------------------------

def _prove_multiple(curve, pk, n, m, v, gamma_vec, commitment_vec,
                    transcript, rng):
    fn = curve.fn
    mn = n * m
    assert pk.length == mn, "generator count must equal n*m"
    assert m & (m - 1) == 0, "aggregation size must be a power of two"

    alpha = rng.alpha()
    v_bits = _bit_decompose(v, n, m)
    A = _bit_commitment(curve, pk, alpha, v_bits, mn)

    V = jnp.stack(list(commitment_vec))
    y, z = transcript.challenge_yz(curve, list(commitment_vec), A)

    from .wip import _fuse_ok

    setup = (_prove_setup_multiple_jit(curve, n, m) if _fuse_ok()
             else _prove_setup_multiple_prog(curve, n, m))
    a_vec, b_vec, power_of_y, alpha_hat = setup(
        jnp.asarray(fn.encode(y)),
        jnp.asarray(fn.encode(z)),
        jnp.asarray(v_bits),
        jnp.asarray(fn.encode(list(gamma_vec))),
        jnp.asarray(fn.encode(alpha)),
        A, V, pk.G_vec, pk.H_vec, pk.g,
    )

    wip = wip_prove(
        curve, pk, a_vec, b_vec, power_of_y, alpha_hat, transcript, rng
    )
    return RangeProof(A=A, proof=wip)


def _prove_setup_multiple_prog(curve, n: int, m: int):
    """Everything between (y, z) and the WIP call (range/mod.rs:283-376):
    a_vec, b_vec, y-powers, α̂ (Â is dead prover work — see the single-
    proof setup docstring). Eagerly these are ~40 dispatches; on a remote
    TPU backend dispatch latency dominates, so TPU runs the jitted wrapper
    below as ONE compiled program."""
    fn = curve.fn
    mn = n * m

    def f(y_m, z_m, bits, gamma_m, alpha_m, A, V, G_vec, H_vec, g):
        power_of_two = jnp.asarray(
            fn.encode([pow(2, i, fn.p) for i in range(n)])
        )
        power_of_y = fn.powers_type2(y_m, mn)
        power_of_y_rev = power_of_y[::-1]
        z_sqr = fn.mul(z_m, z_m)
        power_of_z = fn.powers_type2(z_sqr, m)  # z², z⁴, ...
        # d[j·n + i] = 2^i · z^{2(j+1)}   (range/mod.rs:288-291)
        idx_two = np.arange(mn) % n
        idx_z = np.arange(mn) // n
        d = fn.mul(power_of_two[idx_two], power_of_z[idx_z])

        minus_z = fn.neg(z_m)
        H_exp = fn.add(fn.mul(d, power_of_y_rev), z_m)
        y_mn1 = fn.powers_type2(y_m, mn + 1)[mn]  # y^{mn+1}
        V_exp = fn.mul(power_of_z, y_mn1)  # (m, L)

        one_m = jnp.asarray(fn.one_np)
        one_minus_z = fn.sub(one_m, z_m)
        a_vec = fn.select(bits, jnp.broadcast_to(one_minus_z, (mn, fn.L)),
                          jnp.broadcast_to(minus_z, (mn, fn.L)))
        b_vec = fn.select(bits, H_exp, fn.sub(H_exp, one_m))

        pz_gamma_sum = fn.sum(fn.mul(power_of_z, gamma_m))
        alpha_hat = fn.add(alpha_m, fn.mul(pz_gamma_sum, y_mn1))
        return a_vec, b_vec, power_of_y, alpha_hat

    return f


@functools.lru_cache(maxsize=None)
def _prove_setup_multiple_jit(curve, n: int, m: int):
    import jax

    return jax.jit(_prove_setup_multiple_prog(curve, n, m))


def _verify_multiple(curve, proof, pk, n, m, commitment_vec, transcript):
    from .wip import _fuse_ok

    if _fuse_ok():
        _verify_fused(curve, proof, pk, n, m, commitment_vec, transcript)
        return
    inputs = _verification_inputs_multiple(
        curve, proof, pk, n, m, commitment_vec, transcript
    )
    _check_identity_msm(curve, pk, inputs)


def _tree_prod(fn, a):
    """Π over axis 0 via a balanced tree of field muls ((k, L) → (L,))."""
    k = a.shape[0]
    while k > 1:
        half = k // 2
        paired = fn.mul(a[:half], a[half : 2 * half])
        a = (jnp.concatenate([paired, a[2 * half :]], axis=0)
             if k % 2 else paired)
        k = a.shape[0]
    return a[0]


@functools.lru_cache(maxsize=None)
def _vinputs_multiple_jit(curve, n: int, m: int):
    """Builds the (unjitted) exponent-vector program f for (curve, n, m);
    jitted one-proof and vmapped-K variants below share this body.

    One compiled program for the aggregated verifier's exponent vectors
    (range/mod.rs:423-477 + wip verification_scalars device math): the
    ~40 small field ops would otherwise dispatch eagerly and dominate warm
    verify latency (dispatch ~0.1 s vs 2 ms for the MSM itself)."""
    fn = curve.fn
    mn = n * m
    logn = mn.bit_length() - 1
    idx_two = np.arange(mn) % n
    idx_z = np.arange(mn) // n
    sum_2_np = fn.encode((pow(2, n, fn.p) - 1) % fn.p)  # Σ 2^i, i<n
    two_pows_np = fn.encode([pow(2, i, fn.p) for i in range(n)])
    sbit = np.stack(
        [(np.arange(mn) >> j) & 1 for j in range(logn)], axis=0
    ).astype(bool)  # (logn, mn) bit table for the s_vec product

    def f(y_m, z_m, challenges, e, r_prime, s_prime, d_prime):
        minus_z = fn.neg(z_m)
        z_sqr = fn.mul(z_m, z_m)
        power_of_two = jnp.asarray(two_pows_np)
        power_of_y_all = fn.powers_type2(y_m, mn + 1)
        y_mn1 = power_of_y_all[mn]
        power_of_y = power_of_y_all[:mn]
        power_of_y_rev = power_of_y[::-1]
        power_of_z = fn.powers_type2(z_sqr, m)
        concat_z_and_2 = fn.mul(power_of_two[idx_two], power_of_z[idx_z])

        # verification_scalars device math (wip:330-382). ONE Fermat chain
        # inverts challenges, e and y together (the three separate
        # inversions were ~750 sequential scan steps of tiny muls — pure
        # latency inside the fused verify program).
        _, invs = fn.batch_invert(
            jnp.concatenate([challenges, e[None], y_m[None]], axis=0))
        challenges_inv = invs[:logn]
        e_inv = invs[logn]
        y_inv = invs[logn + 1]
        allinv = _tree_prod(fn, challenges_inv)
        challenges_sqr = fn.mul(challenges, challenges)
        challenges_inv_sqr = fn.mul(challenges_inv, challenges_inv)
        s_vec = jnp.broadcast_to(allinv, (mn, fn.L))
        for j in range(logn):
            s_vec = fn.select(
                jnp.asarray(sbit[j]),
                fn.mul(s_vec, challenges_sqr[logn - 1 - j]),
                s_vec,
            )
        s_prime_vec = s_vec[::-1]

        e_sqr = fn.mul(e, e)
        e_sqr_inv = fn.mul(e_inv, e_inv)
        r_prime_e_inv_y = fn.mul(fn.mul(r_prime, e_inv), y_m)
        s_prime_e_inv = fn.mul(s_prime, e_inv)

        pow_y_inv = fn.powers_type2(y_inv, mn)
        G_exp = fn.sub(
            jnp.broadcast_to(minus_z, (mn, fn.L)),
            fn.mul(fn.mul(s_vec, pow_y_inv), r_prime_e_inv_y),
        )
        H_exp = fn.add(
            fn.neg(fn.mul(s_prime_e_inv, s_prime_vec)),
            fn.add(fn.mul(concat_z_and_2, power_of_y_rev), z_m),
        )

        sum_y = fn.sum(power_of_y)
        sum_z = fn.sum(power_of_z)
        g_exp = fn.add(
            fn.neg(fn.mul(fn.mul(fn.mul(r_prime, s_prime), y_m), e_sqr_inv)),
            fn.sub(
                fn.mul(sum_y, fn.sub(z_m, z_sqr)),
                fn.mul(fn.mul(fn.mul(y_mn1, z_m), jnp.asarray(sum_2_np)), sum_z),
            ),
        )
        h_exp = fn.neg(fn.mul(d_prime, e_sqr_inv))
        V_exp = fn.mul(power_of_z, y_mn1)

        one_m = jnp.asarray(fn.one_np)
        unique_scalars = jnp.concatenate(
            [one_m[None], e_inv[None], e_sqr_inv[None],
             challenges_sqr, challenges_inv_sqr, V_exp], axis=0
        )
        return unique_scalars, G_exp, H_exp, g_exp, h_exp

    return f


@functools.lru_cache(maxsize=None)
def _vinputs_multiple_batched(curve, n: int, m: int):
    """BATCHED-NATIVE twin of _vinputs_multiple_jit: every input carries an
    explicit leading K axis and every op runs on (K, ·) tensors, so the
    Montgomery-mul Pallas kernels see ONE flattened (K·mn)-lane grid per op
    instead of K vmap instances each — the exponent-vector stage dominated
    the fused batch verify's device time under vmap. Same outputs as
    jax.vmap(_vinputs_multiple_jit(...)); differentially tested in
    tests/test_parallel.py."""
    fn = curve.fn
    mn = n * m
    logn = mn.bit_length() - 1
    idx_two = np.arange(mn) % n
    idx_z = np.arange(mn) // n
    sum_2_np = fn.encode((pow(2, n, fn.p) - 1) % fn.p)
    two_pows_np = fn.encode([pow(2, i, fn.p) for i in range(n)])
    sbit = np.stack(
        [(np.arange(mn) >> j) & 1 for j in range(logn)], axis=0
    ).astype(bool)

    def powers2_b(x, nn):  # (K, L) -> (K, nn, L): x, x², ...
        xs = jnp.broadcast_to(x[:, None, :], (x.shape[0], nn, fn.L))
        from jax import lax

        return lax.associative_scan(fn.mul, xs, axis=1)

    def f(y_m, z_m, challenges, e, r_prime, s_prime, d_prime):
        # y_m, z_m, e, r', s', d': (K, L); challenges: (K, logn, L)
        K = y_m.shape[0]
        minus_z = fn.neg(z_m)                      # (K, L)
        z_sqr = fn.mul(z_m, z_m)
        power_of_two = jnp.asarray(two_pows_np)    # (n, L) const
        power_of_y_all = powers2_b(y_m, mn + 1)    # (K, mn+1, L)
        y_mn1 = power_of_y_all[:, mn]
        power_of_y = power_of_y_all[:, :mn]
        power_of_y_rev = power_of_y[:, ::-1]
        power_of_z = powers2_b(z_sqr, m)           # (K, m, L)
        concat_z_and_2 = fn.mul(
            jnp.broadcast_to(power_of_two[idx_two], (K, mn, fn.L)),
            power_of_z[:, idx_z])

        _, invs = fn.batch_invert(
            jnp.concatenate([challenges, e[:, None], y_m[:, None]], axis=1),
            axis=1)
        challenges_inv = invs[:, :logn]
        e_inv = invs[:, logn]
        y_inv = invs[:, logn + 1]
        allinv = challenges_inv[:, 0]
        for j in range(1, logn):
            allinv = fn.mul(allinv, challenges_inv[:, j])
        challenges_sqr = fn.mul(challenges, challenges)
        challenges_inv_sqr = fn.mul(challenges_inv, challenges_inv)
        s_vec = jnp.broadcast_to(allinv[:, None], (K, mn, fn.L))
        for j in range(logn):
            s_vec = fn.select(
                jnp.asarray(sbit[j]),
                fn.mul(s_vec, challenges_sqr[:, None, logn - 1 - j]),
                s_vec,
            )
        s_prime_vec = s_vec[:, ::-1]

        e_sqr = fn.mul(e, e)
        e_sqr_inv = fn.mul(e_inv, e_inv)
        r_prime_e_inv_y = fn.mul(fn.mul(r_prime, e_inv), y_m)
        s_prime_e_inv = fn.mul(s_prime, e_inv)

        pow_y_inv = powers2_b(y_inv, mn)
        G_exp = fn.sub(
            jnp.broadcast_to(minus_z[:, None], (K, mn, fn.L)),
            fn.mul(fn.mul(s_vec, pow_y_inv), r_prime_e_inv_y[:, None]),
        )
        H_exp = fn.add(
            fn.neg(fn.mul(s_prime_e_inv[:, None], s_prime_vec)),
            fn.add(fn.mul(concat_z_and_2, power_of_y_rev), z_m[:, None]),
        )

        sum_y = fn.sum(power_of_y, axis=1)         # (K, L)
        sum_z = fn.sum(power_of_z, axis=1)
        g_exp = fn.add(
            fn.neg(fn.mul(fn.mul(fn.mul(r_prime, s_prime), y_m),
                          e_sqr_inv)),
            fn.sub(
                fn.mul(sum_y, fn.sub(z_m, z_sqr)),
                fn.mul(fn.mul(fn.mul(y_mn1, z_m),
                              jnp.asarray(sum_2_np)), sum_z),
            ),
        )
        h_exp = fn.neg(fn.mul(d_prime, e_sqr_inv))
        V_exp = fn.mul(power_of_z, y_mn1[:, None])

        one_m = jnp.broadcast_to(jnp.asarray(fn.one_np), (K, 1, fn.L))
        unique_scalars = jnp.concatenate(
            [one_m, e_inv[:, None], e_sqr_inv[:, None],
             challenges_sqr, challenges_inv_sqr, V_exp], axis=1
        )
        return unique_scalars, G_exp, H_exp, g_exp, h_exp

    return f


@functools.lru_cache(maxsize=None)
def _vinputs_single_prog(curve, n: int):
    """Single-proof (m=1) exponent-vector program with the same pure
    (y, z, challenges, e, r', s', d') signature as the aggregated one — so
    m=1 batches get the one-vmapped-program treatment too (BASELINE config
    1 is m=1). Mirrors _verification_inputs_single + _wip_verification_
    inputs (range/mod.rs:189-238, wip:238-328; the e²-multiplied equation,
    unlike the aggregated verifier's e⁻² form)."""
    fn = curve.fn
    logn = n.bit_length() - 1
    two_pows_np = fn.encode([pow(2, i, fn.p) for i in range(n)])
    sum2_np = fn.encode((pow(2, n, fn.p) - 1) % fn.p)
    sbit = np.stack(
        [(np.arange(n) >> j) & 1 for j in range(logn)], axis=0
    ).astype(bool)

    def f(y_m, z_m, challenges, e, r_prime, s_prime, d_prime):
        power_of_two = jnp.asarray(two_pows_np)
        power_of_y_all = fn.powers_type2(y_m, n + 1)
        power_of_y = power_of_y_all[:n]
        power_of_y_rev = power_of_y[::-1]
        V_exp_comm = power_of_y_all[n]          # y^{n+1}
        z_sqr = fn.mul(z_m, z_m)
        G_exp_comm = jnp.broadcast_to(fn.neg(z_m), (n, fn.L))
        H_exp_comm = fn.add(fn.mul(power_of_two, power_of_y_rev), z_m)
        g_exp_comm = fn.sub(
            fn.mul(fn.sum(power_of_y), fn.sub(z_m, z_sqr)),
            fn.mul(fn.mul(jnp.asarray(sum2_np), V_exp_comm), z_m),
        )

        # verification_scalars device math (wip:330-382); one Fermat chain
        # for challenges and y together (see the aggregated program)
        _, invs = fn.batch_invert(
            jnp.concatenate([challenges, y_m[None]], axis=0))
        challenges_inv = invs[:logn]
        y_inv = invs[logn]
        allinv = _tree_prod(fn, challenges_inv)
        challenges_sqr = fn.mul(challenges, challenges)
        challenges_inv_sqr = fn.mul(challenges_inv, challenges_inv)
        s_vec = jnp.broadcast_to(allinv, (n, fn.L))
        for j in range(logn):
            s_vec = fn.select(
                jnp.asarray(sbit[j]),
                fn.mul(s_vec, challenges_sqr[logn - 1 - j]),
                s_vec,
            )
        s_prime_vec = s_vec[::-1]

        e_sqr = fn.mul(e, e)
        r_prime_e_y = fn.mul(fn.mul(r_prime, e), y_m)
        s_prime_e = fn.mul(s_prime, e)
        Ls_exp = fn.mul(challenges_sqr, e_sqr)
        Rs_exp = fn.mul(challenges_inv_sqr, e_sqr)

        pow_y_inv = fn.powers_type2(y_inv, n)
        G_exp = fn.sub(
            fn.mul(G_exp_comm, e_sqr),
            fn.mul(fn.mul(s_vec, pow_y_inv), r_prime_e_y),
        )
        H_exp = fn.sub(
            fn.mul(H_exp_comm, e_sqr), fn.mul(s_prime_vec, s_prime_e))
        g_exp = fn.add(
            fn.neg(fn.mul(fn.mul(r_prime, y_m), s_prime)),
            fn.mul(g_exp_comm, e_sqr),
        )
        h_exp = fn.neg(d_prime)
        V_exp = fn.mul(V_exp_comm, e_sqr)

        one_m = jnp.asarray(fn.one_np)
        unique_scalars = jnp.concatenate(
            [one_m[None], e[None], e_sqr[None], Ls_exp, Rs_exp,
             V_exp[None]], axis=0
        )
        return unique_scalars, G_exp, H_exp, g_exp, h_exp

    return f


@functools.lru_cache(maxsize=None)
def _vinputs_single_jit_vmap(curve, n: int):
    import jax

    return jax.jit(jax.vmap(_vinputs_single_prog(curve, n)))


@functools.lru_cache(maxsize=None)
def _vinputs_multiple_jit_one(curve, n: int, m: int):
    import jax

    return jax.jit(_vinputs_multiple_jit(curve, n, m))


@functools.lru_cache(maxsize=None)
def _vinputs_multiple_jit_vmap(curve, n: int, m: int):
    """Batched variant: one compiled program computes EVERY proof's
    exponent vectors over a leading K axis (batch verification would
    otherwise dispatch K copies of the per-proof program — dispatch
    latency dominates on a remote TPU backend)."""
    import jax

    return jax.jit(jax.vmap(_vinputs_multiple_jit(curve, n, m)))


def _verification_inputs_multiple(curve, proof, pk, n, m, commitment_vec,
                                  transcript):
    fn = curve.fn
    mn = n * m
    wproof = proof.proof
    logn = wproof.rounds
    if mn != (1 << logn) or logn != mn.bit_length() - 1:
        raise VerificationError()

    V = jnp.stack(list(commitment_vec))
    # host side: Fiat-Shamir replay (hashing is inherently host-side)
    y, z = transcript.challenge_yz(curve, list(commitment_vec), proof.A)
    es = [
        transcript.round_challenge(curve, wproof.L_vec[i], wproof.R_vec[i]) % fn.p
        for i in range(logn)
    ]
    e = transcript.final_challenge(curve, wproof.A, wproof.B) % fn.p
    if any(c == 0 for c in es) or e == 0 or y % fn.p == 0 or z % fn.p == 0:
        raise VerificationError()

    unique_scalars, G_exp, H_exp, g_exp, h_exp = _vinputs_multiple_jit_one(
        curve, n, m
    )(
        jnp.asarray(fn.encode(y)),
        jnp.asarray(fn.encode(z)),
        jnp.asarray(fn.encode(es)),
        jnp.asarray(fn.encode(e)),
        wproof.r_prime,
        wproof.s_prime,
        wproof.d_prime,
    )
    return VerificationInputs(
        unique_scalars=unique_scalars,
        unique_points=jnp.concatenate(
            [proof.A[None], wproof.A[None], wproof.B[None],
             wproof.L_vec, wproof.R_vec, V], axis=0
        ),
        G_exp=G_exp,
        H_exp=H_exp,
        g_exp=g_exp,
        h_exp=h_exp,
    )
