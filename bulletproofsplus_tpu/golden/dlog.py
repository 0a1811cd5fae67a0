"""Discrete-log-domain oracle: the WHOLE protocol as pure modular integers.

An independent, curve-free transcription of the reference's prover and
verifier equations, exploiting the deterministic generator structure: in
reference mode every base is a known small multiple of g (g=1g, h=2g,
G_i=3(i+1)g, H_i=5(i+1)g — publickey.rs:23-39), so every point the protocol
ever forms is g^x for a computable x, point addition is addition mod the
group order and scalar multiplication is multiplication. The protocol
collapses to arithmetic in Z_q with NO elliptic-curve code at all.

Purpose (test strategy, SURVEY.md §4): `golden/protocol.py` is the primary
differential oracle, but it shares transcription-error risk with any single
reading of the reference. This module was transcribed SEPARATELY, straight
from the reference sources cited per-function below, and exercises a
disjoint execution domain (python ints vs limb tensors). Agreement between
  (a) the device pipeline's proof points,
  (b) g^(this module's dlogs), and
  (c) this module's verifier residue == 0
checks both transcriptions and the device implementation against each other.

Deterministic (reference-constant) mode only: challenges y/z (7,7 single,
12/23 aggregated — range/mod.rs:109-110, :278-279), per-round e=7 (wip:131),
final e=99 (wip:211), blinds alpha=7/33, d_L=4, d_R=5, r=33, s=44, delta=88,
eta=123 (range/mod.rs:94,:256; wip:94-95,:175-178).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List


def _inv(x: int, q: int) -> int:
    return pow(x, q - 2, q)


@dataclass
class DlogProof:
    """All proof elements as discrete logs w.r.t. the base point g."""

    A: int = 0                       # bit commitment (range/mod.rs:259-277)
    L_vec: List[int] = field(default_factory=list)
    R_vec: List[int] = field(default_factory=list)
    A_wip: int = 0                   # wip:189-205
    B: int = 0                       # wip:206-208
    r_prime: int = 0                 # plain scalars (wip:214-216)
    s_prime: int = 0
    d_prime: int = 0


def _gen_dlogs(mn: int):
    """g=1, h=2, G_i=3(i+1), H_i=5(i+1) — publickey.rs:23-39."""
    g, h = 1, 2
    G = [3 * (i + 1) for i in range(mn)]
    H = [5 * (i + 1) for i in range(mn)]
    return g, h, G, H


def _wip_prove(q: int, n: int, a, b, pow_y, alpha_hat: int, G, H, g, h):
    """Fold loop in the dlog domain (weighted_inner_product_proof.rs:36-227).

    a, b, pow_y: plain int lists; G, H: dlog lists; returns DlogProof fields
    for the WIP part. Constants d_L=4, d_R=5, e=7 per round; finals r=33,
    s=44, delta=88, eta=123, e=99."""
    a, b = list(a), list(b)
    pow_y = list(pow_y)
    G, H = list(G), list(H)
    alpha = alpha_hat
    L_vec, R_vec = [], []
    while n != 1:
        n //= 2
        a1, a2 = a[:n], a[n:]
        b1, b2 = b[:n], b[n:]
        y1, y2 = pow_y[:n], pow_y[n:]
        G1, G2 = G[:n], G[n:]
        H1, H2 = H[:n], H[n:]
        # c_L = <a1, y1 . b2>, c_R = <a2, y2 . b1>  (wip:90-91)
        c_L = sum(x * w * y % q for x, w, y in zip(a1, b2, y1)) % q
        c_R = sum(x * w * y % q for x, w, y in zip(a2, b1, y2)) % q
        d_L, d_R = 4, 5
        ynhat = y1[n - 1]
        ynhat_inv = _inv(ynhat, q)
        # L = sum (yn^-1 a1_i) G2_i + sum b2_i H1_i + c_L g + d_L h (wip:98-113)
        L = (sum(ynhat_inv * x % q * P for x, P in zip(a1, G2))
             + sum(w * P for w, P in zip(b2, H1)) + c_L * g + d_L * h) % q
        # R = sum (yn a2_i) G1_i + sum b1_i H2_i + c_R g + d_R h (wip:115-125)
        R = (sum(ynhat * x % q * P for x, P in zip(a2, G1))
             + sum(w * P for w, P in zip(b1, H2)) + c_R * g + d_R * h) % q
        L_vec.append(L)
        R_vec.append(R)
        e = 7
        e_inv = _inv(e, q)
        # folds (wip:147-164)
        a = [(x1 * e + x2 * ynhat % q * e_inv) % q for x1, x2 in zip(a1, a2)]
        b = [(x1 * e_inv + x2 * e) % q for x1, x2 in zip(b1, b2)]
        G = [(e_inv * P1 + ynhat_inv * e % q * P2) % q
             for P1, P2 in zip(G1, G2)]
        H = [(e * P1 + e_inv * P2) % q for P1, P2 in zip(H1, H2)]
        pow_y = y1
        alpha = (alpha + e * e * d_L + e_inv * e_inv * d_R) % q
    r, s, delta, eta = 33, 44, 88, 123
    y0 = pow_y[0]
    rcbsca = (r * y0 % q * b[0] + s * y0 % q * a[0]) % q
    rcs = r * y0 % q * s % q
    A = (r * G[0] + s * H[0] + rcbsca * g + delta * h) % q   # wip:189-205
    B = (rcs * g + eta * h) % q                              # wip:206-208
    e = 99
    return (L_vec, R_vec, A, B,
            (r + a[0] * e) % q,
            (s + b[0] * e) % q,
            (eta + delta * e + alpha * e % q * e) % q)       # wip:211-216


def prove(q: int, n: int, v: List[int], gammas: List[int]) -> DlogProof:
    """range/mod.rs:80-187 (single) / :240-403 (aggregated), dlog domain."""
    m = len(v)
    mn = n * m
    g, h, G, H = _gen_dlogs(mn)
    alpha = 7 if m == 1 else 33
    y, z = (7, 7) if m == 1 else (12, 23)

    bits = [(v[i // n] >> (i % n)) & 1 for i in range(mn)]
    A = (h * alpha + sum(G[i] if bits[i] else -H[i] for i in range(mn))) % q

    pow2 = [pow(2, i, q) for i in range(n)]
    pow_y = [pow(y, i + 1, q) for i in range(mn)]        # exp_iter_type2
    z_sqr = z * z % q
    pow_z = [pow(z_sqr, i + 1, q) for i in range(m)]
    # aggregated: d[i*n+j] = z^{2(i+1)} 2^j (range/mod.rs:287-291);
    # single: d = plain powers of two, no z^2 factor (range/mod.rs:115-128)
    if m == 1:
        d = pow2
    else:
        d = [pz * p2 % q for pz in pow_z for p2 in pow2]
    y_mn_1 = pow(y, mn + 1, q)

    # A_hat exponents (range/mod.rs:296-343; single :122-153)
    H_exp = [(d[i] * pow_y[mn - 1 - i] + z) % q for i in range(mn)]
    # single V exponent is y^{n+1} itself (range/mod.rs:131)
    V_exp = ([y_mn_1] if m == 1
             else [pz * y_mn_1 % q for pz in pow_z])
    g_exp = (sum(pow_y) % q * ((z - z_sqr) % q)
             - sum(d) % q * y_mn_1 % q * z) % q
    V = [(vi + 2 * gi) % q for vi, gi in zip(v, gammas)]  # publickey.rs:50-52
    A_hat = (A - z * sum(G) + sum(e_ * P for e_, P in zip(H_exp, H))
             + g_exp * g + sum(e_ * P for e_, P in zip(V_exp, V))) % q

    a_vec = [(1 - z if b_ else -z) % q for b_ in bits]
    b_vec = [(H_exp[i] - (0 if bits[i] else 1)) % q for i in range(mn)]
    # single alpha_hat = alpha + gamma*y^{n+1} (range/mod.rs:174)
    if m == 1:
        alpha_hat = (alpha + gammas[0] * y_mn_1) % q
    else:
        alpha_hat = (alpha
                     + sum(pz * gi for pz, gi in zip(pow_z, gammas)) % q
                     * y_mn_1) % q

    del A_hat  # the prover never reads P (wip:137-142 dead) — kept for parity
    L_vec, R_vec, A_w, B, r_p, s_p, d_p = _wip_prove(
        q, mn, a_vec, b_vec, pow_y, alpha_hat, G, H, g, h)
    return DlogProof(A=A, L_vec=L_vec, R_vec=R_vec, A_wip=A_w, B=B,
                     r_prime=r_p, s_prime=s_p, d_prime=d_p)


def _verification_scalars(q: int, mn: int, logn: int):
    """wip:330-382: challenge squares/inverse-squares and the s_vec."""
    es = [7] * logn
    allinv = _inv(pow(7, logn, q) if logn else 1, q)
    e_sqr = [e * e % q for e in es]
    e_inv_sqr = [_inv(e, q) ** 2 % q for e in es]
    s_vec = [allinv]
    for i in range(1, mn):
        log_i = i.bit_length() - 1
        k = 1 << log_i
        s_vec.append(s_vec[i - k] * e_sqr[logn - 1 - log_i] % q)
    return e_sqr, e_inv_sqr, s_vec, 99


def verify(q: int, n: int, proof: DlogProof, V: List[int]) -> bool:
    """The one-MSM verification equation in the dlog domain: the residue
    sum(scalar_i * dlog_i) mod q must be 0 (range/mod.rs:405-510 aggregated,
    wip:238-328 via range/mod.rs:189-238 single)."""
    m = len(V)
    mn = n * m
    g, h, G, H = _gen_dlogs(mn)
    y, z = (7, 7) if m == 1 else (12, 23)
    logn = len(proof.L_vec)
    if mn != (1 << logn):
        return False

    pow2 = [pow(2, i, q) for i in range(n)]
    pow_y = [pow(y, i + 1, q) for i in range(mn)]
    z_sqr = z * z % q
    pow_z = [pow(z_sqr, i + 1, q) for i in range(m)]
    if m == 1:       # single-proof d has no z^2 factor (range/mod.rs:209-218)
        d = pow2
    else:
        d = [pz * p2 % q for pz in pow_z for p2 in pow2]
    y_mn_1 = pow(y, mn + 1, q)
    y_inv = _inv(y, q)
    pow_y_inv = [pow(y_inv, i + 1, q) for i in range(mn)]

    e_sqr, e_inv_sqr, s_vec, e = _verification_scalars(q, mn, logn)
    e_inv = _inv(e, q)
    e_sqr_inv = e_inv * e_inv % q

    sum_y = sum(pow_y) % q
    sum_2 = (pow(2, n, q) - 1) % q
    sum_z = sum(pow_z) % q

    if m == 1:
        # wip:238-328 with the commitment exponents of range/mod.rs:205-227:
        # every commitment exponent is scaled by e^2 and the proof terms by
        # {1, e, e^2}
        r_p_e_y = proof.r_prime * e % q * y % q
        G_exp = [(-s_vec[i] * pow_y_inv[i] % q * r_p_e_y
                  + (-z) * (e * e)) % q       # G_exp_of_commitment_i = -z
                 for i in range(mn)]
        H_exp_c = [(d[i] * pow_y[mn - 1 - i] + z) % q for i in range(mn)]
        H_exp = [(-s_vec[mn - 1 - i] * (proof.s_prime * e) % q
                  + H_exp_c[i] * (e * e)) % q for i in range(mn)]
        g_exp_c = (sum_y * ((z - z_sqr) % q)
                   - sum_2 * y_mn_1 % q * z) % q
        g_exp = (-proof.r_prime * y % q * proof.s_prime
                 + g_exp_c * (e * e)) % q
        h_exp = -proof.d_prime % q
        res = (proof.B + e * proof.A_wip + e * e % q * proof.A
               + g_exp * g + h_exp * h
               + sum(es * L * e * e for es, L in zip(e_sqr, proof.L_vec))
               + sum(es * R * e * e
                     for es, R in zip(e_inv_sqr, proof.R_vec))
               + sum(ge * P for ge, P in zip(G_exp, G))
               + sum(he * P for he, P in zip(H_exp, H))
               + y_mn_1 * (e * e) % q * V[0]) % q
        return res == 0

    # aggregated: range/mod.rs:444-509
    r_p_e_inv_y = proof.r_prime * e_inv % q * y % q
    s_p_e_inv = proof.s_prime * e_inv % q
    G_exp = [(-z - s_vec[i] * pow_y_inv[i] % q * r_p_e_inv_y) % q
             for i in range(mn)]
    H_exp = [(-s_p_e_inv * s_vec[mn - 1 - i]
              + (d[i] * pow_y[mn - 1 - i] % q + z)) % q for i in range(mn)]
    g_exp = (-proof.r_prime * proof.s_prime % q * y % q * e_sqr_inv
             + (sum_y * ((z - z_sqr) % q)
                - y_mn_1 * z % q * sum_2 % q * sum_z)) % q
    h_exp = -proof.d_prime * e_sqr_inv % q
    V_exp = [pz * y_mn_1 % q for pz in pow_z]

    res = (proof.A + e_inv * proof.A_wip + e_sqr_inv * proof.B
           + g_exp * g + h_exp * h
           + sum(es * L for es, L in zip(e_sqr, proof.L_vec))
           + sum(es * R for es, R in zip(e_inv_sqr, proof.R_vec))
           + sum(ge * P for ge, P in zip(G_exp, G))
           + sum(he * P for he, P in zip(H_exp, H))
           + sum(ve * Vi for ve, Vi in zip(V_exp, V))) % q
    return res == 0
