"""SHA-256 as a JAX program: the device half of the fs256 Fiat-Shamir mode.

The reference's upstream used a host-side Merlin transcript; its fork
stripped it (weighted_inner_product_proof.rs:69-71,339-348). The restored
host transcripts (ShaTranscript / MerlinBppTranscript) force the interactive
prover into one host round-trip per fold round. This module implements the
FIPS 180-4 SHA-256 core over uint32 words as ordinary jnp ops, so the fs256
transcript (transcript.py::Fs256Transcript) can be evaluated INSIDE the
prover's compiled program: challenges are derived in-graph and the whole
sound-mode fold loop becomes one device dispatch, like the known-challenge
path.

Scope notes:
- Messages here are protocol-internal and of STATIC length (point
  coordinates + tags), so padding is precomputed at trace time — there is
  no variable-length streaming API.
- The same byte protocol is implemented on the host by Fs256Transcript
  (hashlib); tests/test_fs256.py holds the two equal.
- Leading batch axes broadcast: state (..., 8), blocks (..., nblocks, 16).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# FIPS 180-4 §4.2.2 round constants and §5.3.3 initial hash value
_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5,
    0x3956c25b, 0x59f111f1, 0x923f82a4, 0xab1c5ed5,
    0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174,
    0xe49b69c1, 0xefbe4786, 0x0fc19dc6, 0x240ca1cc,
    0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7,
    0xc6e00bf3, 0xd5a79147, 0x06ca6351, 0x14292967,
    0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85,
    0xa2bfe8a1, 0xa81a664b, 0xc24b8b70, 0xc76c51a3,
    0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5,
    0x391c0cb3, 0x4ed8aa4a, 0x5b9cca4f, 0x682e6ff3,
    0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
], dtype=np.uint32)

IV = np.array([
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
], dtype=np.uint32)


def _rotr(x, n: int):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def sha256_compress(state, block):
    """One compression: state (..., 8) uint32, block (..., 16) uint32.

    Both the message schedule and the 64 rounds run as lax.scan loops: the
    hash is inherently sequential, and the fs256 prover inlines ~6
    compressions per fold round — unrolled they ballooned the whole-fold
    program's HLO by ~100k ops and stalled XLA:CPU compiles; as scans each
    compression is two tiny loop bodies."""
    from jax import lax

    def sched(win, _):
        # w[t] = w[t-16] + σ0(w[t-15]) + w[t-7] + σ1(w[t-2]);
        # win holds w[t-16..t-1]
        s0 = _rotr(win[..., 1], 7) ^ _rotr(win[..., 1], 18) ^ (
            win[..., 1] >> jnp.uint32(3))
        s1 = _rotr(win[..., 14], 17) ^ _rotr(win[..., 14], 19) ^ (
            win[..., 14] >> jnp.uint32(10))
        wt = win[..., 0] + s0 + win[..., 9] + s1
        return jnp.concatenate([win[..., 1:], wt[..., None]], axis=-1), wt

    _, w_hi = lax.scan(sched, block, None, length=48)     # (48, ...)
    W = jnp.concatenate([jnp.moveaxis(block, -1, 0), w_hi], axis=0)

    def comp(st, xw):
        wt, kt = xw
        a, b, c, d, e, f, g, h = [st[..., i] for i in range(8)]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kt + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return jnp.stack(
            [t1 + t2, a, b, c, d + t1, e, f, g], axis=-1), None

    out, _ = lax.scan(comp, state, (W, jnp.asarray(_K)))
    return state + out


def sha256_blocks(state, blocks):
    """Chain compressions over a STATIC number of blocks:
    state (..., 8), blocks (..., nb, 16) → (..., 8). The per-call block
    count is small (≤ a handful) and known at trace time, so a python loop
    keeps the graph flat."""
    for i in range(blocks.shape[-2]):
        state = sha256_compress(state, blocks[..., i, :])
    return state


@functools.lru_cache(maxsize=None)
def padding_words(msg_bytes: int):
    """FIPS 180-4 §5.1.1 padding for a message of static byte length that
    is a multiple of 4 (all fs256 messages are word-aligned): returns the
    numpy uint32 words to append (0x80…, zeros, 64-bit bit length)."""
    assert msg_bytes % 4 == 0
    total = msg_bytes + 1 + 8
    nblocks = -(-total // 64)
    pad_bytes = nblocks * 64 - msg_bytes
    pad = bytearray(pad_bytes)
    pad[0] = 0x80
    bitlen = msg_bytes * 8
    pad[-8:] = bitlen.to_bytes(8, "big")
    return np.frombuffer(bytes(pad), dtype=">u4").astype(np.uint32)


def sha256_words(words, msg_bytes: int):
    """Hash a word-aligned message given as uint32 words (..., nw) of
    static byte length; returns the digest as (..., 8) uint32."""
    pad = padding_words(msg_bytes)
    lead = words.shape[:-1]
    padw = jnp.broadcast_to(jnp.asarray(pad), (*lead, pad.shape[0]))
    full = jnp.concatenate([words, padw], axis=-1)
    nb = full.shape[-1] // 16
    blocks = full.reshape(*lead, nb, 16)
    state = jnp.broadcast_to(jnp.asarray(IV), (*lead, 8))
    return sha256_blocks(state, blocks)


def tag_words(tag: bytes):
    """A static ASCII tag as uint32 words (must be 4-byte aligned; pad
    with spaces at definition sites)."""
    assert len(tag) % 4 == 0
    return np.frombuffer(tag, dtype=">u4").astype(np.uint32)


# ---------------------------------------------------------------------------
# field-element <-> word packing (layout-independent bytes)
#
# Transcript bytes must not depend on the limb layout (12-bit TPU lanes vs
# 24-bit CPU lanes), so coordinates are serialized as big-endian integers of
# the field's canonical byte length. W ∈ {12, 24} is a multiple of 4, so the
# conversion is an exact, carry-free nibble repack — pure static gathers.
# ---------------------------------------------------------------------------


def field_nbytes(ops) -> int:
    """Canonical big-endian byte length of a field element (32 for 255/256-
    bit moduli, 48 for bls12-381 Fq)."""
    return (ops.spec.modulus.bit_length() + 7) // 8


@functools.lru_cache(maxsize=None)
def _pack_indices(W: int, L: int, nbytes: int):
    nn = 2 * nbytes          # nibbles that carry value
    t = np.arange(nn)
    li = (t // (W // 4)).astype(np.int32)          # source limb per nibble
    sh = (4 * (t % (W // 4))).astype(np.int32)     # shift inside the limb
    assert li.max() < L
    j = np.arange(nbytes)
    lo = (2 * (nbytes - 1 - j)).astype(np.int32)   # big-endian byte order
    return li, sh, lo


def field_be_words(ops, x):
    """Plain canonical limbs (..., L) → big-endian uint32 words
    (..., nbytes/4). Value must be fully reduced (< p)."""
    nbytes = field_nbytes(ops)
    li, sh, lo = _pack_indices(ops.W, ops.L, nbytes)
    xs = x.astype(jnp.uint32)
    nibs = (xs[..., li] >> jnp.asarray(sh, jnp.uint32)) & jnp.uint32(0xF)
    byts = nibs[..., lo] | (nibs[..., lo + 1] << jnp.uint32(4))
    b = byts.reshape(*byts.shape[:-1], nbytes // 4, 4)
    return ((b[..., 0] << jnp.uint32(24)) | (b[..., 1] << jnp.uint32(16))
            | (b[..., 2] << jnp.uint32(8)) | b[..., 3])


@functools.lru_cache(maxsize=None)
def _digest_mont_consts(fn):
    """C_j = 2^{32·(15-j)}·R² mod p as limb arrays: fn.mul(w_j, C_j) =
    Montgomery(w_j · 2^{32·(15-j)}), so a 512-bit digest reduces to the
    scalar field with 16 modmuls + a sum — unbiased (2^512 >> p)."""
    from .utils.convert import int_to_limbs

    p = fn.p
    R = fn.r_mod_p if hasattr(fn, "r_mod_p") else None
    if R is None:
        R = fn.spec.r_mod_p
    consts = np.stack([
        int_to_limbs(pow(2, 32 * (15 - j), p) * R % p * R % p, fn.L, fn.W)
        for j in range(16)
    ])
    return consts


@functools.lru_cache(maxsize=None)
def _word_limb_shifts(W: int, L: int):
    k = -(-32 // W)                  # limbs needed for a 32-bit word
    sh = (W * np.arange(k)).astype(np.int32)
    return k, sh


def digest_to_field_mont(fn, words):
    """(..., 16) uint32 digest words (big-endian significance order) →
    Montgomery-form field element (..., L): Σ_j w_j·2^{32(15-j)} mod p."""
    k, sh = _word_limb_shifts(fn.W, fn.L)
    mask = jnp.uint32((1 << fn.W) - 1)
    wl = (words[..., None] >> jnp.asarray(sh, jnp.uint32)) & mask
    wl = wl.astype(jnp.int32 if fn.W <= 15 else jnp.int64)
    pad = jnp.zeros((*wl.shape[:-1], fn.L - k), wl.dtype)
    wl = jnp.concatenate([wl, pad], axis=-1)       # (..., 16, L) plain
    consts = jnp.asarray(_digest_mont_consts(fn))  # (16, L)
    prods = fn.mul(wl, jnp.broadcast_to(consts, wl.shape))
    return fn.sum(prods, axis=-2)
