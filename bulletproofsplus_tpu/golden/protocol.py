"""Pure-Python Bulletproofs+ protocol — executable spec / differential-test oracle.

A faithful transcription of the reference's protocol semantics:
  - PublicKey small-multiple generators   (reference src/publickey.rs:21-48)
  - RangeProver commitments               (reference src/range/prover.rs:28-42)
  - prove_single / prove_multiple         (reference src/range/mod.rs:80-187, :240-403)
  - verify_single / verify_multiple       (reference src/range/mod.rs:189-238, :405-510)
  - WIP argument prove/verify/scalars     (reference src/weighted_inner_product_proof.rs)

Challenges come from a Transcript and blindings from an Rng so that the
reference's deterministic mode (hardcoded constants, SURVEY.md §2.9) and the
real Fiat-Shamir mode share one code path. In deterministic mode the output is
bit-exactly what the reference produces; the TPU implementation is
differential-tested against this module.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence

from .curves import Affine, CURVES, EdwardsCurve, WeierstrassCurve
from ..errors import ProofError, VerificationError

Curve = WeierstrassCurve | EdwardsCurve


# ---------------------------------------------------------------------------
# Challenge / blinding sources
# ---------------------------------------------------------------------------

class DeterministicTranscript:
    """Replays the reference's hardcoded Fiat-Shamir challenges.

    Values per SURVEY.md §2.9: single-proof y=z=7 (range/mod.rs:109-110),
    aggregated y=12 z=23 (range/mod.rs:278-279), per-round e=7
    (weighted_inner_product_proof.rs:131), final e=99 (:211).
    """

    def __init__(self, m: int):
        self.m = m

    def challenge_yz(self) -> tuple[int, int]:
        return (7, 7) if self.m == 1 else (12, 23)

    def round_challenge(self, L: Affine, R: Affine) -> int:
        return 7

    def final_challenge(self, A: Affine, B: Affine) -> int:
        return 99


class DeterministicRng:
    """Replays the reference's hardcoded blinding values.

    alpha=7 single / 33 aggregated (range/mod.rs:94, :256); per-round
    d_L=4 d_R=5 (weighted_inner_product_proof.rs:94-95); final
    r=33 s=44 delta=88 eta=123 (:175-178).
    """

    def __init__(self, m: int):
        self.m = m

    def alpha(self) -> int:
        return 7 if self.m == 1 else 33

    def round_blinds(self) -> tuple[int, int]:
        return (4, 5)

    def final_blinds(self) -> tuple[int, int, int, int]:
        return (33, 44, 88, 123)


# ---------------------------------------------------------------------------
# Public key / prover state
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class PublicKey:
    g: Affine
    h: Affine
    G_vec: List[Affine]
    H_vec: List[Affine]

    @classmethod
    def new(cls, curve: Curve, length: int) -> "PublicKey":
        """Small-multiple generators, matching publickey.rs:23-39:
        g = 1g, h = 2g, G_i = 3(i+1)g, H_i = 5(i+1)g.

        Deliberately insecure (known discrete logs) — kept for bit-exact
        parity with the reference; use hash-derived generators in real mode.
        """
        g = curve.base()
        h = curve.mul(g, 2)
        G_vec = [curve.mul(g, 3 * (i + 1)) for i in range(length)]
        H_vec = [curve.mul(g, 5 * (i + 1)) for i in range(length)]
        return cls(g=g, h=h, G_vec=G_vec, H_vec=H_vec)

    def commitment(self, curve: Curve, v: int, gamma: int) -> Affine:
        # Pedersen commitment g*v + h*gamma (publickey.rs:50-52)
        return curve.add(curve.mul(self.g, v), curve.mul(self.h, gamma))


@dataclasses.dataclass
class RangeProver:
    """Witness container, matching range/prover.rs:13-42."""

    v_vec: List[int] = dataclasses.field(default_factory=list)
    gamma_vec: List[int] = dataclasses.field(default_factory=list)
    commitment_vec: List[Affine] = dataclasses.field(default_factory=list)

    def commit(self, curve: Curve, pk: PublicKey, v: int, gamma: int) -> None:
        self.v_vec.append(v)
        self.gamma_vec.append(gamma)
        self.commitment_vec.append(pk.commitment(curve, v, gamma))


# ---------------------------------------------------------------------------
# Proof data
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class WipProof:
    L_vec: List[Affine]
    R_vec: List[Affine]
    A: Affine
    B: Affine
    r_prime: int
    s_prime: int
    d_prime: int


@dataclasses.dataclass
class RangeProof:
    A: Affine
    proof: WipProof


# ---------------------------------------------------------------------------
# Scalar helpers (reference src/util.rs)
# ---------------------------------------------------------------------------

def powers_type1(fn, x: int, n: int) -> List[int]:
    """1, x, x^2, ... (util.rs:29-32)."""
    out, cur = [], 1
    for _ in range(n):
        out.append(cur)
        cur = fn.mul(cur, x)
    return out


def powers_type2(fn, x: int, n: int) -> List[int]:
    """x, x^2, x^3, ... (util.rs:34-37)."""
    out, cur = [], x % fn.p
    for _ in range(n):
        out.append(cur)
        cur = fn.mul(cur, x)
    return out


def sum_of_powers_type1(fn, x: int, n: int) -> int:
    return sum(powers_type1(fn, x, n)) % fn.p


def sum_of_powers_type2(fn, x: int, n: int) -> int:
    return sum(powers_type2(fn, x, n)) % fn.p


def weighted_inner_product(fn, a, b, c) -> int:
    """sum a_i * b_i * c_i (util.rs:117-127)."""
    return sum(ai * bi % fn.p * ci for ai, bi, ci in zip(a, b, c)) % fn.p


# ---------------------------------------------------------------------------
# WIP argument (reference src/weighted_inner_product_proof.rs)
# ---------------------------------------------------------------------------

def wip_prove(
    curve: Curve,
    pk: PublicKey,
    a_vec: Sequence[int],
    b_vec: Sequence[int],
    power_of_y_vec: Sequence[int],
    alpha: int,
    P: Affine,
    transcript,
    rng,
) -> WipProof:
    fn = curve.fn
    G = list(pk.G_vec)
    H = list(pk.H_vec)
    a = list(a_vec)
    b = list(b_vec)
    power_of_y = list(power_of_y_vec)

    n = len(G)
    assert n == len(H) == len(a) == len(b) == len(power_of_y)
    assert n & (n - 1) == 0, "length must be a power of two"

    L_vec: List[Affine] = []
    R_vec: List[Affine] = []

    while n != 1:
        n //= 2
        a1, a2 = a[:n], a[n:]
        b1, b2 = b[:n], b[n:]
        y1, y2 = power_of_y[:n], power_of_y[n:]
        G1, G2 = G[:n], G[n:]
        H1, H2 = H[:n], H[n:]

        c_L = weighted_inner_product(fn, a1, b2, y1)
        c_R = weighted_inner_product(fn, a2, b1, y2)
        d_L, d_R = rng.round_blinds()

        y_nhat = y1[n - 1]
        y_nhat_inv = fn.inv(y_nhat)

        # L = sum (y_nhat^-1 a1_i) G2_i + sum b2_i H1_i + c_L g + d_L h
        #   (wip prove mv_g2, weighted_inner_product_proof.rs:103-113)
        L = curve.msm(
            [fn.mul(y_nhat_inv, ai) for ai in a1] + list(b2) + [c_L, d_L],
            G2 + H1 + [pk.g, pk.h],
        )
        # R = sum (y_nhat a2_i) G1_i + sum b1_i H2_i + c_R g + d_R h  (:115-125)
        R = curve.msm(
            [fn.mul(y_nhat, ai) for ai in a2] + list(b1) + [c_R, d_R],
            G1 + H2 + [pk.g, pk.h],
        )
        L_vec.append(L)
        R_vec.append(R)

        e = transcript.round_challenge(L, R) % fn.p
        e_inv = fn.inv(e)
        e_sqr = fn.mul(e, e)
        e_sqr_inv = fn.mul(e_inv, e_inv)

        P = curve.msm([1, e_sqr, e_sqr_inv], [P, L, R])

        y_nhat_e_inv = fn.mul(y_nhat, e_inv)
        y_nhat_inv_e = fn.mul(y_nhat_inv, e)

        a = [fn.add(fn.mul(a1[i], e), fn.mul(a2[i], y_nhat_e_inv)) for i in range(n)]
        b = [fn.add(fn.mul(b1[i], e_inv), fn.mul(b2[i], e)) for i in range(n)]
        G = [
            curve.msm([e_inv, y_nhat_inv_e], [G1[i], G2[i]]) for i in range(n)
        ]
        H = [curve.msm([e, e_inv], [H1[i], H2[i]]) for i in range(n)]
        power_of_y = y1
        alpha = fn.add(alpha, fn.add(fn.mul(e_sqr, d_L), fn.mul(e_sqr_inv, d_R)))

    r, s, delta, eta = rng.final_blinds()
    y0 = power_of_y[0]
    # rcbsca = r y b0 + s y a0; rcs = r y s  (:181-182)
    rcbsca = fn.add(r * y0 % fn.p * b[0] % fn.p, s * y0 % fn.p * a[0] % fn.p)
    rcs = r * y0 % fn.p * s % fn.p

    A = curve.msm([r, s, rcbsca, delta], [G[0], H[0], pk.g, pk.h])
    B = curve.msm([rcs, eta], [pk.g, pk.h])

    e = transcript.final_challenge(A, B) % fn.p
    r_prime = fn.add(r, fn.mul(a[0], e))
    s_prime = fn.add(s, fn.mul(b[0], e))
    d_prime = fn.add(eta, fn.add(fn.mul(delta, e), alpha * e % fn.p * e % fn.p))

    return WipProof(L_vec, R_vec, A, B, r_prime, s_prime, d_prime)


def verification_scalars(
    curve: Curve, proof: WipProof, n: int, transcript
) -> tuple[List[int], List[int], List[int], int]:
    """Challenge replay + s_vec expansion (wip:330-381)."""
    fn = curve.fn
    logn = len(proof.L_vec)
    if n != (1 << logn):
        raise VerificationError()

    challenges = [
        transcript.round_challenge(L, R) % fn.p
        for L, R in zip(proof.L_vec, proof.R_vec)
    ]
    allinv, challenges_inv = fn.batch_invert(challenges)
    challenges_sqr = [fn.mul(c, c) for c in challenges]
    challenges_inv_sqr = [fn.mul(c, c) for c in challenges_inv]

    e = transcript.final_challenge(proof.A, proof.B) % fn.p

    # s_vec recurrence (wip:372-380): s_0 = prod e_j^-1,
    # s_i = s_{i-2^log_i} * e^2_{logn-1-log_i}
    s_vec = [allinv]
    for i in range(1, n):
        log_i = i.bit_length() - 1
        k = 1 << log_i
        s_vec.append(fn.mul(s_vec[i - k], challenges_sqr[(logn - 1) - log_i]))
    return challenges_sqr, challenges_inv_sqr, s_vec, e


def wip_verify(
    curve: Curve,
    pk: PublicKey,
    proof: WipProof,
    power_of_y_vec: Sequence[int],
    G_exp_comm: Sequence[int],
    H_exp_comm: Sequence[int],
    g_exp_comm: int,
    V_exp_comm: Sequence[int],
    A_prime: Affine,
    V: Sequence[Affine],
    transcript,
) -> None:
    """Single-MSM WIP verification (wip:238-328). Raises on failure."""
    fn = curve.fn
    logn = len(proof.L_vec)
    n = 1 << logn
    if len(G_exp_comm) != n or len(H_exp_comm) != n:
        # proof size does not match the statement (the reference would panic
        # on an out-of-bounds index here; we fail verification cleanly)
        raise VerificationError()
    y = power_of_y_vec[0]

    challenges_sqr, challenges_inv_sqr, s_vec, e = verification_scalars(
        curve, proof, n, transcript
    )
    s_prime_vec = list(reversed(s_vec))
    e_sqr = fn.mul(e, e)
    r_prime_e_y = proof.r_prime * e % fn.p * y % fn.p
    s_prime_e = fn.mul(proof.s_prime, e)

    Ls_exp = [fn.mul(c, e_sqr) for c in challenges_sqr]
    Rs_exp = [fn.mul(c, e_sqr) for c in challenges_inv_sqr]

    y_inv = fn.inv(y)
    pow_y_inv = powers_type2(fn, y_inv, n)
    G_exp = [
        fn.sub(fn.mul(G_exp_comm[i], e_sqr),
               s_vec[i] * pow_y_inv[i] % fn.p * r_prime_e_y % fn.p)
        for i in range(n)
    ]
    H_exp = [
        fn.sub(fn.mul(H_exp_comm[i], e_sqr), fn.mul(s_prime_vec[i], s_prime_e))
        for i in range(n)
    ]
    g_exp = fn.add(
        fn.neg(proof.r_prime * y % fn.p * proof.s_prime % fn.p),
        fn.mul(g_exp_comm, e_sqr),
    )
    h_exp = fn.neg(proof.d_prime)
    V_exp = [fn.mul(v, e_sqr) for v in V_exp_comm]

    scalars = (
        [1, e, e_sqr, g_exp, h_exp]
        + Ls_exp + Rs_exp + G_exp + H_exp + V_exp
    )
    points = (
        [proof.B, proof.A, A_prime, pk.g, pk.h]
        + proof.L_vec + proof.R_vec + pk.G_vec + pk.H_vec + list(V)
    )
    expected = curve.msm(scalars, points)
    if not curve.is_identity(expected):
        raise VerificationError()


# ---------------------------------------------------------------------------
# Range proofs (reference src/range/mod.rs)
# ---------------------------------------------------------------------------

def prove(
    curve: Curve,
    pk: PublicKey,
    n: int,
    prover: RangeProver,
    transcript=None,
    rng=None,
) -> RangeProof:
    m = len(prover.v_vec)
    pk = _pk_prefix(pk, n * m)
    transcript = transcript or DeterministicTranscript(m)
    rng = rng or DeterministicRng(m)
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
    curve: Curve,
    proof: RangeProof,
    pk: PublicKey,
    n: int,
    commitment_vec: Sequence[Affine],
    transcript=None,
) -> None:
    m = len(commitment_vec)
    pk = _pk_prefix(pk, n * m)
    transcript = transcript or DeterministicTranscript(m)
    if m == 1:
        _verify_single(curve, proof, pk, n, commitment_vec[0], transcript)
    else:
        _verify_multiple(curve, proof, pk, n, m, commitment_vec, transcript)


def _pk_prefix(pk: PublicKey, mn: int) -> PublicKey:
    """The reference accepts generator sets LONGER than n·m (only shorter
    is an error, errors.rs:37-41 InvalidGeneratorsLength) and uses the
    first n·m generators; mirror that by slicing a prefix view."""
    if len(pk.G_vec) == mn:
        return pk
    return PublicKey(g=pk.g, h=pk.h,
                     G_vec=pk.G_vec[:mn], H_vec=pk.H_vec[:mn])


def _bit_decompose(v: Sequence[int], n: int, m: int) -> List[int]:
    """v_bits[i] = bit (i % n) of v[i // n] (range/mod.rs:263-277)."""
    return [(v[i // n] >> (i % n)) & 1 for i in range(n * m)]


def _prove_single(curve, pk, n, v, gamma, commitment, transcript, rng):
    fn = curve.fn
    assert len(pk.G_vec) == n and len(pk.H_vec) == n

    alpha = rng.alpha()
    v_bits = _bit_decompose([v], n, 1)
    A = curve.sum(
        [curve.mul(pk.h, alpha)]
        + [pk.G_vec[i] if v_bits[i] else curve.neg(pk.H_vec[i]) for i in range(n)]
    )

    y, z = transcript.challenge_yz()
    y, z = y % fn.p, z % fn.p

    power_of_two = powers_type1(fn, 2, n)
    power_of_y = powers_type2(fn, y, n)
    power_of_y_rev = list(reversed(power_of_y))

    G_vec_sum = curve.sum(pk.G_vec)

    G_vec_sum_exp = fn.neg(z)
    H_exp = [
        fn.add(fn.mul(power_of_two[i], power_of_y_rev[i]), z) for i in range(n)
    ]
    V_exp = fn.pow(y, n + 1)
    g_exp = fn.mul(sum(power_of_y) % fn.p, fn.sub(z, fn.mul(z, z)))
    g_exp = fn.sub(g_exp, (fn.pow(2, n) - 1) * V_exp % fn.p * z % fn.p)

    A_hat = curve.msm(
        [1, G_vec_sum_exp] + H_exp + [g_exp, V_exp],
        [A, G_vec_sum] + pk.H_vec + [pk.g, commitment],
    )

    nz = fn.neg(z)
    one_minus_z = fn.sub(1, z)
    a_vec = [one_minus_z if b else nz for b in v_bits]
    b_vec = [H_exp[i] if v_bits[i] else fn.sub(H_exp[i], 1) for i in range(n)]
    alpha_hat = fn.add(alpha, fn.mul(gamma, V_exp))

    wip = wip_prove(curve, pk, a_vec, b_vec, power_of_y, alpha_hat, A_hat,
                    transcript, rng)
    return RangeProof(A=A, proof=wip)


def _verify_single(curve, proof, pk, n, commitment, transcript):
    fn = curve.fn
    y, z = transcript.challenge_yz()
    y, z = y % fn.p, z % fn.p

    power_of_two = powers_type1(fn, 2, n)
    power_of_y = powers_type2(fn, y, n)
    power_of_y_rev = list(reversed(power_of_y))

    G_exp = [fn.neg(z)] * n
    H_exp = [
        fn.add(fn.mul(power_of_two[i], power_of_y_rev[i]), z) for i in range(n)
    ]
    V_exp = fn.pow(y, n + 1)
    g_exp = fn.mul(sum(power_of_y) % fn.p, fn.sub(z, fn.mul(z, z)))
    g_exp = fn.sub(g_exp, (fn.pow(2, n) - 1) * V_exp % fn.p * z % fn.p)

    wip_verify(
        curve, pk, proof.proof, power_of_y, G_exp, H_exp, g_exp, [V_exp],
        proof.A, [commitment], transcript,
    )


def _prove_multiple(curve, pk, n, m, v, gamma_vec, commitment_vec,
                    transcript, rng):
    fn = curve.fn
    mn = n * m
    assert len(pk.G_vec) == mn and len(pk.H_vec) == mn

    alpha = rng.alpha()
    v_bits = _bit_decompose(v, n, m)
    A = curve.sum(
        [curve.mul(pk.h, alpha)]
        + [pk.G_vec[i] if v_bits[i] else curve.neg(pk.H_vec[i]) for i in range(mn)]
    )

    y, z = transcript.challenge_yz()
    y, z = y % fn.p, z % fn.p

    power_of_two = powers_type1(fn, 2, n)
    power_of_y = powers_type2(fn, y, mn)
    power_of_y_rev = list(reversed(power_of_y))
    z_sqr = fn.mul(z, z)
    power_of_z = powers_type2(fn, z_sqr, m)
    # d[j*n + i] = 2^i * z^{2(j+1)} (range/mod.rs:288-291)
    d = [fn.mul(power_of_two[i % n], power_of_z[i // n]) for i in range(mn)]

    G_vec_sum_exp = fn.neg(z)
    H_exp = [fn.add(fn.mul(d[i], power_of_y_rev[i]), z) for i in range(mn)]
    y_mn1 = fn.pow(y, mn + 1)
    V_exp = [fn.mul(pz, y_mn1) for pz in power_of_z]

    g_exp = fn.mul(sum(power_of_y) % fn.p, fn.sub(z, z_sqr))
    d_sum = sum(d) % fn.p
    g_exp = fn.sub(g_exp, d_sum * y_mn1 % fn.p * z % fn.p)

    G_vec_sum = curve.sum(pk.G_vec)

    A_hat = curve.msm(
        [1, G_vec_sum_exp] + H_exp + [g_exp] + V_exp,
        [A, G_vec_sum] + pk.H_vec + [pk.g] + list(commitment_vec),
    )

    nz = fn.neg(z)
    one_minus_z = fn.sub(1, z)
    a_vec = [one_minus_z if b else nz for b in v_bits]
    b_vec = [H_exp[i] if v_bits[i] else fn.sub(H_exp[i], 1) for i in range(mn)]

    pz_gamma_sum = sum(
        fn.mul(pz, g) for pz, g in zip(power_of_z, gamma_vec)
    ) % fn.p
    alpha_hat = fn.add(alpha, fn.mul(pz_gamma_sum, y_mn1))

    wip = wip_prove(curve, pk, a_vec, b_vec, power_of_y, alpha_hat, A_hat,
                    transcript, rng)
    return RangeProof(A=A, proof=wip)


def _verify_multiple(curve, proof, pk, n, m, commitment_vec, transcript):
    fn = curve.fn
    mn = n * m

    y, z = transcript.challenge_yz()
    y, z = y % fn.p, z % fn.p
    minus_z = fn.neg(z)
    z_sqr = fn.mul(z, z)

    power_of_two = powers_type1(fn, 2, n)
    power_of_y_all = powers_type2(fn, y, mn + 1)
    y_mn1 = power_of_y_all[mn]
    power_of_y = power_of_y_all[:mn]
    power_of_y_rev = list(reversed(power_of_y))
    power_of_z = powers_type2(fn, z_sqr, m)
    concat_z_and_2 = [
        fn.mul(power_of_two[i % n], power_of_z[i // n]) for i in range(mn)
    ]

    challenges_sqr, challenges_inv_sqr, s_vec, e = verification_scalars(
        curve, proof.proof, mn, transcript
    )
    s_prime_vec = list(reversed(s_vec))

    e_inv = fn.inv(e)
    e_sqr = fn.mul(e, e)
    e_sqr_inv = fn.inv(e_sqr)
    r_prime_e_inv_y = proof.proof.r_prime * e_inv % fn.p * y % fn.p
    s_prime_e_inv = fn.mul(proof.proof.s_prime, e_inv)

    y_inv = fn.inv(y)
    pow_y_inv = powers_type2(fn, y_inv, mn)
    G_exp = [
        fn.sub(minus_z, s_vec[i] * pow_y_inv[i] % fn.p * r_prime_e_inv_y % fn.p)
        for i in range(mn)
    ]
    H_exp = [
        fn.add(
            fn.neg(fn.mul(s_prime_e_inv, s_prime_vec[i])),
            fn.add(fn.mul(concat_z_and_2[i], power_of_y_rev[i]), z),
        )
        for i in range(mn)
    ]

    sum_y = sum_of_powers_type2(fn, y, mn)
    sum_2 = sum_of_powers_type1(fn, 2, n)
    sum_z = sum_of_powers_type2(fn, z_sqr, m)

    r_p, s_p, d_p = proof.proof.r_prime, proof.proof.s_prime, proof.proof.d_prime
    g_exp = fn.add(
        fn.neg(r_p * s_p % fn.p * y % fn.p * e_sqr_inv % fn.p),
        fn.sub(
            fn.mul(sum_y, fn.sub(z, z_sqr)),
            y_mn1 * z % fn.p * sum_2 % fn.p * sum_z % fn.p,
        ),
    )
    h_exp = fn.neg(fn.mul(d_p, e_sqr_inv))
    V_exp = [fn.mul(pz, y_mn1) for pz in power_of_z]

    scalars = (
        [1, e_inv, e_sqr_inv, g_exp, h_exp]
        + challenges_sqr + challenges_inv_sqr + G_exp + H_exp + V_exp
    )
    points = (
        [proof.A, proof.proof.A, proof.proof.B, pk.g, pk.h]
        + proof.proof.L_vec + proof.proof.R_vec
        + pk.G_vec + pk.H_vec + list(commitment_vec)
    )
    expected = curve.msm(scalars, points)
    if not curve.is_identity(expected):
        raise VerificationError()
