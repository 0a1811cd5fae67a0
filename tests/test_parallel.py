"""Sharded-MSM, batch verification, and multi-chip dry-run tests on the
virtual 8-device CPU mesh."""
import random

import jax
import jax.numpy as jnp
import pytest

from bulletproofsplus_tpu import (
    PublicKey,
    RangeProver,
    VerificationError,
    curve_ops,
    prove,
)
from bulletproofsplus_tpu.curves import golden_curve
from bulletproofsplus_tpu.msm import msm
from bulletproofsplus_tpu.parallel import default_mesh, sharded_msm
from bulletproofsplus_tpu.protocol import batch_verify


def test_sharded_msm_matches_plain():
    curve = curve_ops("edwards25519")
    gc = golden_curve("edwards25519")
    rng = random.Random(7)
    N = 37  # deliberately not a multiple of the device count
    pts = [gc.mul(gc.base(), rng.randrange(1, gc.fn.p)) for _ in range(N)]
    ks = [rng.randrange(gc.fn.p) for _ in range(N)]
    P = jnp.asarray(curve.encode_points(pts))
    s = jnp.asarray(curve.fn.encode_plain(ks))

    mesh = default_mesh(8, dp=1)
    got = sharded_msm(curve, s, P, mesh)
    assert curve.decode_point(got) == gc.msm(ks, pts)


def test_sharded_fixed_msm_matches_plain():
    from bulletproofsplus_tpu.msm.fixed import precompute_tables
    from bulletproofsplus_tpu.parallel import sharded_fixed_msm

    curve = curve_ops("edwards25519")
    gc = golden_curve("edwards25519")
    rng = random.Random(11)
    N = 16  # table point axis must divide the mesh axis evenly
    pts = [gc.mul(gc.base(), rng.randrange(1, gc.fn.p)) for _ in range(N)]
    ks = [rng.randrange(gc.fn.p) for _ in range(N)]
    P = jnp.asarray(curve.encode_points(pts))
    s = jnp.asarray(curve.fn.encode_plain(ks))

    table = precompute_tables(curve, P)
    mesh = default_mesh(8, dp=1)
    got = sharded_fixed_msm(curve, s, table, mesh)
    assert curve.decode_point(got) == gc.msm(ks, pts)


def test_batch_verify_sharded_fixed_base(proof_batch, monkeypatch):
    """The mesh path with fixed-base tables enabled (tp-sharded tables)
    accepts good proofs and rejects corrupted ones."""
    import dataclasses

    curve, pk, proofs, commits = proof_batch
    monkeypatch.setenv("BPP_FIXED_BASE", "1")
    mesh = default_mesh(8, dp=1)
    batch_verify(curve, pk, 8, proofs[:2], commits[:2], mesh=mesh)

    bad = list(proofs[:2])
    bad[0] = dataclasses.replace(
        bad[0],
        proof=dataclasses.replace(
            bad[0].proof, d_prime=jnp.asarray(curve.fn.encode(24682468))
        ),
    )
    with pytest.raises(VerificationError):
        batch_verify(curve, pk, 8, bad, commits[:2], mesh=mesh)


@pytest.fixture(scope="module")
def proof_batch():
    """Three (n=8, m=2) proofs over one pk, built once and shared by every
    batch-verification test (proving dominates test wall-clock)."""
    curve = curve_ops("edwards25519")
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    proofs, commits = [], []
    for j in range(3):
        prover = RangeProver()
        for i in range(m):
            prover.commit(pk, (5 * j + 3 * i + 2) % (1 << n), 2 * i + j + 3)
        proofs.append(prove(curve, pk, n, prover))
        commits.append(prover.commitment_vec)
    return curve, pk, proofs, commits


def test_batch_verify_accepts(proof_batch):
    curve, pk, proofs, commits = proof_batch
    batch_verify(curve, pk, 8, proofs, commits)


def test_batch_verify_rejects_one_bad(proof_batch):
    import dataclasses

    curve, pk, proofs, commits = proof_batch
    bad = list(proofs)
    bad[1] = dataclasses.replace(
        bad[1],
        proof=dataclasses.replace(
            bad[1].proof, r_prime=jnp.asarray(curve.fn.encode(987654321))
        ),
    )
    with pytest.raises(VerificationError):
        batch_verify(curve, pk, 8, bad, commits)


def test_batch_verify_sharded(proof_batch):
    curve, pk, proofs, commits = proof_batch
    mesh = default_mesh(8, dp=1)
    batch_verify(curve, pk, 8, proofs[:2], commits[:2], mesh=mesh)


def test_batch_verify_dp_groups(proof_batch):
    """dp>1: K proofs fold into dp group mega-MSMs, each sharded over its
    mesh row's tp axis; a tampered proof in EITHER group must reject."""
    import dataclasses

    curve, pk, proofs, commits = proof_batch
    mesh = default_mesh(8, dp=2)
    batch_verify(curve, pk, 8, proofs[:2], commits[:2], mesh=mesh)

    bad = list(proofs[:2])
    bad[1] = dataclasses.replace(
        bad[1],
        proof=dataclasses.replace(
            bad[1].proof, s_prime=jnp.asarray(curve.fn.encode(13371337))
        ),
    )
    with pytest.raises(VerificationError):
        batch_verify(curve, pk, 8, bad, commits[:2], mesh=mesh)


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert bool(out) in (True, False)


def test_batch_verify_identify_bad_proof(proof_batch):
    """Per-shard failure re-dispatch (SURVEY.md §5): a batch with one
    tampered proof must FAIL as a whole and the bisecting re-dispatch must
    name exactly the offending index."""
    import jax.numpy as jnp

    from bulletproofsplus_tpu.protocol import batch_verify_identify

    curve, pk, proofs, commits = proof_batch
    import dataclasses

    bad_idx = 2
    bad = list(proofs)
    bad[bad_idx] = dataclasses.replace(
        bad[bad_idx],
        proof=dataclasses.replace(
            bad[bad_idx].proof,
            r_prime=jnp.asarray(curve.fn.encode(987654321)),
        ),
    )
    got = batch_verify_identify(curve, pk, 8, bad, commits)
    assert got == [bad_idx]
    # clean batch → no indices
    assert batch_verify_identify(curve, pk, 8, proofs, commits) == []


def test_vinputs_batched_native_matches_vmap():
    """The batched-native exponent-vector program (explicit K axis — the
    fused batch verifier's hot field stage) computes exactly the vmapped
    per-proof program's outputs."""
    import jax
    import numpy as np

    from bulletproofsplus_tpu.protocol.range import (
        _vinputs_multiple_batched,
        _vinputs_multiple_jit,
    )

    curve = curve_ops("edwards25519")
    fn = curve.fn
    n, m, K = 8, 2, 3
    logn = (n * m).bit_length() - 1
    rng = np.random.RandomState(7)

    def rnd(*shape):
        vals = [int(rng.randint(1, 1 << 30))
                for _ in range(int(np.prod(shape)))]
        return jnp.asarray(fn.encode(vals)).reshape(*shape, fn.L)

    args = (rnd(K), rnd(K), rnd(K, logn), rnd(K),
            rnd(K), rnd(K), rnd(K))
    ref = jax.jit(jax.vmap(_vinputs_multiple_jit(curve, n, m)))(*args)
    got = jax.jit(_vinputs_multiple_batched(curve, n, m))(*args)
    for name, x, y in zip(("uniq", "G_exp", "H_exp", "g_exp", "h_exp"),
                          got, ref):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name
