"""Fixed-base MSM (msm/fixed.py): table correctness + verify-path parity.

The fixed-base engine must agree with the general windowed-ladder engine for
every curve backend, and the fixed-base verify paths must accept exactly the
proofs the ladder paths accept (and reject corrupted ones).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from bulletproofsplus_tpu.curves import curve_ops
from bulletproofsplus_tpu.curves.instances import base_point
from bulletproofsplus_tpu.hostmath import host_curve
from bulletproofsplus_tpu.msm.engine import msm
from bulletproofsplus_tpu.msm.fixed import fixed_msm, precompute_tables


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1", "bls12_381"])
def test_fixed_msm_matches_ladder(name):
    curve = curve_ops(name)
    hc = host_curve(name)
    base = base_point(name)
    N = 6
    pts = [hc.mul(base, 3 * (i + 1)) for i in range(N)]
    P = jnp.asarray(curve.encode_points(pts))
    rng = np.random.default_rng(42)
    ks = [int.from_bytes(rng.bytes(32), "big") % curve.fn.p for _ in range(N)]
    S = jnp.asarray(curve.fn.encode_plain(ks))

    table = precompute_tables(curve, P)
    got = curve.decode_point(fixed_msm(curve, S, table))
    want = curve.decode_point(msm(curve, S, P))
    assert got == want
    host = hc.msm(ks, pts)
    assert got == (host if host else None)


def test_fixed_msm_zero_scalars_is_identity():
    curve = curve_ops("edwards25519")
    hc = host_curve("edwards25519")
    pts = [hc.mul(base_point("edwards25519"), i + 2) for i in range(4)]
    P = jnp.asarray(curve.encode_points(pts))
    table = precompute_tables(curve, P)
    S = jnp.zeros((4, curve.fn.L), jnp.int32)
    out = fixed_msm(curve, S, table)
    assert bool(curve.is_identity(out))


def test_verify_paths_fixed_base_parity(monkeypatch):
    """verify/batch_verify accept the same proofs with and without the
    fixed-base tables, and reject corrupted statements either way."""
    from bulletproofsplus_tpu import (
        PublicKey,
        RangeProver,
        prove,
        verify,
    )
    from bulletproofsplus_tpu.errors import VerificationError
    from bulletproofsplus_tpu.protocol import batch_prove, batch_verify

    curve = curve_ops("edwards25519")
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    prover = RangeProver()
    prover.commit(pk, 2, 3)
    prover.commit(pk, 5, 7)
    proof = prove(curve, pk, n, prover)

    for flag in ("0", "1"):
        monkeypatch.setenv("BPP_FIXED_BASE", flag)
        verify(curve, proof, pk, n, prover.commitment_vec)

    provers = []
    for k in range(4):
        p = RangeProver()
        p.commit(pk, (k + 2) % (1 << n), 3 + k)
        p.commit(pk, 5, 7 + k)
        provers.append(p)
    pb = batch_prove(curve, pk, n, provers)
    commits = jnp.stack([jnp.stack(p.commitment_vec) for p in provers])
    bad = commits.at[0, 0, 0, 0].set(commits[0, 0, 0, 0] + 1)

    for flag in ("0", "1"):
        monkeypatch.setenv("BPP_FIXED_BASE", flag)
        batch_verify(curve, pk, n, pb, commits)
        with pytest.raises(VerificationError):
            batch_verify(curve, pk, n, pb, bad)


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1", "bls12_381"])
def test_signed_digits_value_preserving(name):
    """Balanced recoding: Σ d'_j·2^(c·j) == scalar, magnitudes ≤ 2^(c-1)."""
    curve = curve_ops(name)
    fn = curve.fn
    rng = np.random.default_rng(3)
    ks = [int.from_bytes(rng.bytes(32), "big") % fn.p for _ in range(16)]
    ks += [0, 1, fn.p - 1, (1 << 64) - 1]
    S = jnp.asarray(fn.encode_plain(ks))
    mag, neg = fn.scalar_digits_signed(S, fn.order_bits, 4)
    mag_np, neg_np = np.asarray(mag), np.asarray(neg)
    assert mag_np.max() <= 8
    for i, k in enumerate(ks):
        val = sum(
            (-int(m) if s else int(m)) << (4 * j)
            for j, (m, s) in enumerate(zip(mag_np[i], neg_np[i]))
        )
        assert val == k, (name, i)


@pytest.mark.parametrize("name", ["edwards25519", "bls12_381"])
def test_fixed_msm_signed_matches_unsigned(name):
    """The signed half-table engine computes the same MSM as the unsigned
    table and the ladder (the flavor that unlocks BASELINE config 4)."""
    from bulletproofsplus_tpu.msm.fixed import precompute_tables_signed

    curve = curve_ops(name)
    hc = host_curve(name)
    base = base_point(name)
    N = 5
    pts = [hc.mul(base, 2 * i + 3) for i in range(N)]
    P = jnp.asarray(curve.encode_points(pts))
    rng = np.random.default_rng(11)
    ks = [int.from_bytes(rng.bytes(32), "big") % curve.fn.p
          for _ in range(N - 1)] + [0]
    S = jnp.asarray(curve.fn.encode_plain(ks))

    t_s = precompute_tables_signed(curve, P)
    got = curve.decode_point(fixed_msm(curve, S, t_s))
    want = curve.decode_point(msm(curve, S, P))
    assert got == want


@pytest.mark.parametrize("name", ["edwards25519", "bls12_381"])
def test_fixed_kernel_signed_interpret(name):
    """The signed Pallas lookup kernel (interpret mode) == the signed XLA
    path == the ladder."""
    from bulletproofsplus_tpu.curves.pallas_curve import (
        fixed_msm_kernel,
        fixed_table_kernel_layout,
    )
    from bulletproofsplus_tpu.msm.fixed import precompute_tables_signed

    curve = curve_ops(name)
    hc = host_curve(name)
    base = base_point(name)
    N = 4
    pts = [hc.mul(base, 5 * i + 2) for i in range(N)]
    P = jnp.asarray(curve.encode_points(pts))
    rng = np.random.default_rng(23)
    ks = [int.from_bytes(rng.bytes(32), "big") % curve.fn.p
          for _ in range(N - 1)] + [0]
    S = jnp.asarray(curve.fn.encode_plain(ks))

    t5 = precompute_tables_signed(curve, P)
    t2 = fixed_table_kernel_layout(curve, t5)
    got = curve.decode_point(fixed_msm_kernel(
        curve, S, t2, curve.fn.order_bits, signed=True, interpret=True))
    want = curve.decode_point(msm(curve, S, P))
    assert got == want
