"""fs256: the device-evaluable Fiat-Shamir transcript.

Three layers of differential coverage:
1. device SHA-256 / packing primitives vs hashlib (fast, pure jnp);
2. device transcript chain (absorb + challenge) vs the host twin
   Fs256Transcript on all three curves, identity included;
3. the whole-fold fs256 prover program vs the host-driven interactive
   path: byte-identical proofs, verify accept + tamper reject.
"""
import dataclasses
import hashlib
import random

import jax.numpy as jnp
import numpy as np
import pytest

from bulletproofsplus_tpu import (
    DeterministicRng,
    Fs256Transcript,
    PublicKey,
    RangeProver,
    VerificationError,
    curve_ops,
    verify,
)
from bulletproofsplus_tpu.curves import golden_curve
from bulletproofsplus_tpu.hashers_device import (
    digest_to_field_mont,
    field_be_words,
    field_nbytes,
    sha256_words,
)
from bulletproofsplus_tpu.protocol.fs256 import (
    _absorb_points,
    _challenge_mont,
)
from bulletproofsplus_tpu.protocol.range import prove
from bulletproofsplus_tpu.serialize import proof_to_bytes


def test_sha256_device_matches_hashlib():
    for msg_len in (0, 4, 32, 44, 64, 100, 160, 228, 256):
        msg = bytes(range(200)) * 2
        msg = msg[:msg_len]
        words = (jnp.asarray(np.frombuffer(msg, dtype=">u4").astype(
            np.uint32)) if msg_len else jnp.zeros((0,), jnp.uint32))
        d = np.asarray(sha256_words(words, msg_len))
        got = b"".join(int(x).to_bytes(4, "big") for x in d)
        assert got == hashlib.sha256(msg).digest(), msg_len


@pytest.mark.parametrize("spec_name", ["ed25519_fp", "ed25519_fl",
                                       "secp256k1_fn", "bls12_381_fq"])
def test_field_packing_and_digest_reduction(spec_name):
    from bulletproofsplus_tpu.fields import ALL_SPECS, field_ops
    from bulletproofsplus_tpu.utils.convert import int_to_limbs

    spec = ALL_SPECS[spec_name]
    ops = field_ops(spec)
    nb = field_nbytes(ops)
    rng = random.Random(5)
    xs = [rng.randrange(spec.modulus) for _ in range(4)] + [
        0, 1, spec.modulus - 1]
    limbs = jnp.asarray(np.stack(
        [int_to_limbs(x, ops.L, ops.W) for x in xs]))
    w = np.asarray(field_be_words(ops, limbs))
    for i, x in enumerate(xs):
        got = b"".join(int(t).to_bytes(4, "big") for t in w[i])
        assert got == x.to_bytes(nb, "big")

    d = np.frombuffer(hashlib.sha512(spec_name.encode()).digest(),
                      dtype=">u4").astype(np.uint32)
    e = ops.decode(digest_to_field_mont(ops, jnp.asarray(d)))
    assert e == int.from_bytes(
        hashlib.sha512(spec_name.encode()).digest(), "big") % spec.modulus


@pytest.mark.parametrize("name", ["edwards25519", "secp256k1", "bls12_381"])
def test_device_transcript_matches_host_twin(name):
    curve = curve_ops(name)
    gc = golden_curve(name)
    pts = [gc.mul(gc.base(), 7), gc.mul(gc.base(), 1234567), None]
    t = Fs256Transcript(2)
    st = jnp.asarray(t.state_words())
    P = jnp.asarray(curve.encode_points(pts))
    st = _absorb_points(curve, st, b"LR  ", P[:2])
    st, e1m = _challenge_mont(curve.fn, st, b"e   ", 1)
    st = _absorb_points(curve, st, b"AB  ", jnp.stack([P[2], P[0]]))
    st, e2m = _challenge_mont(curve.fn, st, b"ef  ", 2)

    t._absorb_points(curve, b"LR  ", [pts[0], pts[1]])
    assert curve.fn.decode(e1m) == t._challenge(curve, b"e   ")
    t._absorb_points(curve, b"AB  ", [None, pts[0]])
    assert curve.fn.decode(e2m) == t._challenge(curve, b"ef  ")
    assert bytes(t._state) == b"".join(
        int(x).to_bytes(4, "big") for x in np.asarray(st))


def test_fs256_device_prover_matches_interactive(monkeypatch):
    """The one-dispatch in-graph-challenge program must produce the same
    bytes as the host-driven interactive loop with the same transcript."""
    curve = curve_ops("edwards25519")
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    p = RangeProver()
    for i in range(m):
        p.commit(pk, (3 * i + 2) % (1 << n), 2 * i + 3)

    monkeypatch.setenv("BPP_FUSE_PROVER", "0")
    pf_host = prove(curve, pk, n, p, transcript=Fs256Transcript(m),
                    rng=DeterministicRng(m))
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    pf_dev = prove(curve, pk, n, p, transcript=Fs256Transcript(m),
                   rng=DeterministicRng(m))
    assert (proof_to_bytes(curve, pf_host)
            == proof_to_bytes(curve, pf_dev))

    verify(curve, pf_dev, pk, n, p.commitment_vec,
           transcript=Fs256Transcript(m))
    bad = dataclasses.replace(
        pf_dev, proof=dataclasses.replace(
            pf_dev.proof, r_prime=pf_dev.proof.r_prime.at[0].add(1)))
    with pytest.raises(VerificationError):
        verify(curve, bad, pk, n, p.commitment_vec,
               transcript=Fs256Transcript(m))


def test_fs256_batch_matches_sequential(monkeypatch):
    """The vmapped fs256 batch program == K sequential fs256 proves."""
    from bulletproofsplus_tpu.protocol import batch_prove, batch_verify
    from bulletproofsplus_tpu.protocol import stack_commitments

    curve = curve_ops("edwards25519")
    n, m, K = 8, 2, 2
    pk = PublicKey.new(curve, n * m)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)

    monkeypatch.setenv("BPP_BATCH_VMAP", "1")  # CPU: run the real pipeline
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    pbatch = batch_prove(
        curve, pk, n, provers,
        transcripts=[Fs256Transcript(m) for _ in range(K)],
        rngs=[DeterministicRng(m) for _ in range(K)])
    for i, p in enumerate(provers):
        want = prove(curve, pk, n, p, transcript=Fs256Transcript(m),
                     rng=DeterministicRng(m))
        assert (proof_to_bytes(curve, pbatch[i])
                == proof_to_bytes(curve, want))
    commits = stack_commitments(curve, [p.commitment_vec for p in provers])
    batch_verify(curve, pk, n, pbatch, commits,
                 transcripts=[Fs256Transcript(m) for _ in range(K)])


def test_fs256_replay_matches_host_twin(monkeypatch):
    """The in-graph verifier replay (fs256_replay) derives exactly the
    challenges the host twin derives from the same proof — the device half
    of sound one-dispatch verification."""
    from bulletproofsplus_tpu.protocol.fs256 import fs256_replay

    curve = curve_ops("edwards25519")
    fn = curve.fn
    n, m = 8, 2
    pk = PublicKey.new(curve, n * m)
    p = RangeProver()
    for i in range(m):
        p.commit(pk, (3 * i + 2) % (1 << n), 2 * i + 3)
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    pf = prove(curve, pk, n, p, transcript=Fs256Transcript(m),
               rng=DeterministicRng(m))

    # host twin replay
    tr = Fs256Transcript(m)
    y, z = tr.challenge_yz(curve, list(p.commitment_vec), pf.A)
    logn = pf.proof.rounds
    es = [tr.round_challenge(curve, pf.proof.L_vec[i], pf.proof.R_vec[i])
          for i in range(logn)]
    ef = tr.final_challenge(curve, pf.proof.A, pf.proof.B)

    dy, dz, des, def_ = fs256_replay(
        curve, m, jnp.stack(list(p.commitment_vec)), pf.A,
        pf.proof.L_vec, pf.proof.R_vec, pf.proof.A, pf.proof.B)
    assert fn.decode(np.asarray(dy)) == y % fn.p
    assert fn.decode(np.asarray(dz)) == z % fn.p
    for i in range(logn):
        assert fn.decode(np.asarray(des[i])) == es[i] % fn.p
    assert fn.decode(np.asarray(def_)) == ef % fn.p


def test_fs256_batch_verify_rejects_tampered(monkeypatch):
    """The in-graph-replay batch verifier must reject a tampered member."""
    from bulletproofsplus_tpu.protocol import batch_prove, batch_verify
    from bulletproofsplus_tpu.protocol import stack_commitments

    curve = curve_ops("edwards25519")
    n, m, K = 8, 2, 2
    pk = PublicKey.new(curve, n * m)
    provers = []
    for k in range(K):
        p = RangeProver()
        for i in range(m):
            p.commit(pk, (7 * k + 3 * i + 2) % (1 << n), 2 * i + k + 3)
        provers.append(p)
    monkeypatch.setenv("BPP_BATCH_VMAP", "1")
    monkeypatch.setenv("BPP_FUSE_PROVER", "1")
    pbatch = batch_prove(
        curve, pk, n, provers,
        transcripts=[Fs256Transcript(m) for _ in range(K)],
        rngs=[DeterministicRng(m) for _ in range(K)])
    commits = stack_commitments(curve, [p.commitment_vec for p in provers])
    bad = dataclasses.replace(
        pbatch, r_prime=pbatch.r_prime.at[1].add(1))
    with pytest.raises(VerificationError):
        batch_verify(curve, pk, n, bad, commits,
                     transcripts=[Fs256Transcript(m) for _ in range(K)])


def test_fs256_kbatched_program_matches_vmap(monkeypatch):
    """The batched-native fs256 whole-fold program (in-graph challenges,
    flat kernel grids) computes the same function as the vmapped fs256
    program. As in test_batchprove's kbatched test, the Pallas joint ladder
    is replaced by an XLA reference on CPU — this pins the K-axis
    bookkeeping and the per-round transcript-state threading."""
    import numpy as np

    import jax

    from bulletproofsplus_tpu.curves import pallas_curve
    from bulletproofsplus_tpu.msm.engine import _scalar_mul_jit
    from bulletproofsplus_tpu.protocol import fs256 as fs256_mod

    def ref_joint_grouped(curve, scalars, points, nbits, jway,
                          interpret=False):
        fn = curve.fn
        lead = points.shape[:-3]
        N = points.shape[-3]
        G = N // jway
        sm = _scalar_mul_jit(curve, nbits)
        prods = sm(jnp.broadcast_to(jnp.asarray(scalars), (*lead, N, fn.L)),
                   points)
        prods = prods.reshape(*lead, G, jway, *prods.shape[-2:])
        out = prods[..., 0, :, :]
        for j in range(1, jway):
            out = curve.add(out, prods[..., j, :, :])
        return out

    monkeypatch.setattr(
        pallas_curve, "joint_ladder_msm_grouped", ref_joint_grouped)

    curve = curve_ops("edwards25519")
    fn = curve.fn
    n, K = 8, 2
    logn = 3
    pk = PublicKey.new(curve, n)
    rng = np.random.RandomState(1)

    def rnd(*shape):
        vals = [int(rng.randint(1, 1 << 30))
                for _ in range(int(np.prod(shape)))]
        return jnp.asarray(fn.encode(vals)).reshape(*shape, fn.L)

    a, b = rnd(K, n), rnd(K, n)
    ys = [int(rng.randint(2, 1 << 20)) for _ in range(K)]
    pys = [[pow(y, i + 1, fn.p) for i in range(n)] for y in ys]
    power_of_y = jnp.asarray(
        fn.encode([v for row in pys for v in row])).reshape(K, n, fn.L)
    states = jnp.asarray(np.stack(
        [Fs256Transcript(2).state_words() for _ in range(K)]))
    args = (a, b, power_of_y, rnd(K), pk.G_vec, pk.H_vec, pk.g, pk.h,
            states, rnd(K, logn), rnd(K, logn),
            rnd(K), rnd(K), rnd(K), rnd(K))

    kb = jax.jit(fs256_mod._wip_prove_fs256_kbatched_prog(curve, n, K))(*args)
    ref = jax.jit(jax.vmap(
        fs256_mod._wip_prove_fs256_prog(curve, n),
        in_axes=(0, 0, 0, 0, None, None, None, None, 0, 0, 0, 0, 0, 0, 0),
    ))(*args)

    names = ("L_vec", "R_vec", "A", "B", "r_prime", "s_prime", "d_prime",
             "state")
    for name, x, y in zip(names, kb, ref):
        x, y = np.asarray(x), np.asarray(y)
        if name in ("r_prime", "s_prime", "d_prime", "state"):
            assert np.array_equal(x, y), name
        else:
            flat_x = x.reshape(-1, *x.shape[-2:])
            flat_y = y.reshape(-1, *y.shape[-2:])
            for i in range(flat_x.shape[0]):
                assert (curve.decode_point(flat_x[i])
                        == curve.decode_point(flat_y[i])), (name, i)
